"""Discretized-demo-keyframe oracle must succeed on the benchmark four.

This is the calibration invariant behind the protocol eval artifact: a policy
that predicts its training targets exactly (the next keyframe per arm,
discretized at the VoxAct-B operating point — voxel 50, crop radius 0.3,
5-degree rotation bins) clears every benchmark task through the REAL eval step
path (workspace checks, collision-checked planning, 40-degree grasp cone,
arm-arm separation). Guards against task-layout or discretization regressions
silently zeroing the eval ceiling. See tools/oracle_protocol_check.py.
"""

import pytest

from voxactb_tpu.sim.environment import BimanualTaskEnvironment
from voxactb_tpu.sim.tasks import TASK_REGISTRY

TASKS = ["open_jar", "open_drawer", "put_item_in_drawer", "hand_over_item"]


@pytest.mark.parametrize("task", TASKS)
def test_oracle_succeeds(task):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "oracle_protocol_check",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "oracle_protocol_check.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    env = BimanualTaskEnvironment(
        TASK_REGISTRY[task], cameras=["wrist", "wrist2"], image_size=32,
        episode_length=25, seed=43)
    for ep in range(2):
        out = mod.oracle_episode(env, voxel_size=50, rotation_resolution=5,
                                 crop_radius=0.3, ep=ep)
        assert out["success"], (task, ep, out)
