"""Random-shooting MPC + pushing dynamics."""

import numpy as np

from voxactb_tpu.voxposer.controller import (
    MPCConfig,
    PushingDynamicsModel,
    RandomShootingMPC,
)


def test_dynamics_moves_along_push():
    dyn = PushingDynamicsModel(efficiency=1.0)
    out = dyn.predict(np.array([0.3, 0.0, 0.8]), np.array([0.25, 0.0, 0.8]),
                      np.array([1.0, 0.0, 0.0]), np.array(0.1))
    np.testing.assert_allclose(out, [0.4, 0.0, 0.8], atol=1e-9)


def test_mpc_plans_toward_target():
    mpc = RandomShootingMPC(cfg=MPCConfig(num_samples=256), seed=0)
    obj = np.array([0.3, 0.0, 0.8])
    tgt = np.array([0.3, 0.15, 0.8])  # push in +y
    contact, direction, dist = mpc.plan_push(obj, 0.03, tgt)
    assert direction[1] > 0.7  # mostly +y
    # the chosen plan lands near the target under the model
    final = mpc.dynamics.predict(obj, contact, direction, np.array(dist))
    assert np.linalg.norm(final - tgt) < 0.05
    # contact on the far side of the object
    assert contact[1] < obj[1]


def test_execute_push_drives_env():
    class RecEnv:
        def __init__(self):
            self.calls = []

        def step(self, action, arm):
            self.calls.append((arm, np.asarray(action)))

    env = RecEnv()
    mpc = RandomShootingMPC()
    mpc.execute_push(env, "right", [0.3, 0.0, 0.8], [0, 1, 0], 0.1)
    assert len(env.calls) == 3  # approach, push, retreat
    ys = [a[1][1] for a in env.calls]
    assert ys[1] > ys[0] and ys[2] < ys[1]  # out and back
