"""Agent layer: the act()/update() contract and the QAttention BC agents."""

from voxactb_tpu.agents.base import ActResult, Agent, Summary, ScalarSummary  # noqa: F401
