"""Invariants of the analytic roofline model (tools/cost_model.py).

Regression for the round-3 bug where per-stage dicts stayed per-act while the
totals scaled with batch, making bench's batched stage-ceiling table 8x low
against its own batch-scaled SOL keys.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from cost_model import act_cost, speed_of_light, train_cost  # noqa: E402


@pytest.mark.parametrize("fused", [False, True])
def test_act_cost_scales_linearly_with_batch(fused):
    c1 = act_cost(n=50, batch=1, fused_decoder=fused, fused_front=fused)
    c8 = act_cost(n=50, batch=8, fused_decoder=fused, fused_front=fused)
    assert c8["flops"] == pytest.approx(8 * c1["flops"])
    assert c8["activation_bytes"] == pytest.approx(8 * c1["activation_bytes"])
    # weights are fetched once per step regardless of batch
    assert c8["weight_bytes"] == pytest.approx(c1["weight_bytes"])


@pytest.mark.parametrize("batch", [1, 8])
def test_stage_dicts_sum_to_totals(batch):
    c = act_cost(n=100, batch=batch)
    assert sum(c["flops_by_stage"].values()) == pytest.approx(c["flops"])
    assert sum(c["bytes_by_stage"].values()) == pytest.approx(
        c["activation_bytes"])
    assert c["bytes"] == pytest.approx(
        c["activation_bytes"] + c["weight_bytes"])


def test_train_cost_remat_trades_bytes_for_flops():
    base = train_cost(n=50, batch=8)
    remat = train_cost(n=50, batch=8, remat=True)
    assert remat["activation_bytes"] < base["activation_bytes"]
    assert remat["flops"] > base["flops"]
    assert base["fwd_flops"] < base["flops"]


def test_speed_of_light_bound_labels():
    c = act_cost(n=100, batch=1)
    relay = speed_of_light(c, 180e12, 66e9)
    assert relay["sol_ms"] == pytest.approx(
        max(relay["compute_ms"], relay["memory_ms"]))
    assert relay["bound"] in ("compute", "memory")
