"""Failure recovery + profiling instrumentation."""

import numpy as np
import pytest

from voxactb_tpu.envs.fake_env import FakeBimanualEnv
from voxactb_tpu.utils.profiling import StepTimer, host_gauges
from voxactb_tpu.utils.recovery import RecoveringEnv, retry


class FlakyEnv(FakeBimanualEnv):
    """Crashes on the first N reset calls and on command."""

    def __init__(self, fail_resets=2, **kw):
        super().__init__(**kw)
        self._fail_resets = fail_resets
        self.crash_next_step = False

    def reset(self):
        if self._fail_resets > 0:
            self._fail_resets -= 1
            raise RuntimeError("sim crashed during reset")
        return super().reset()

    def step(self, action, which_arm):
        if self.crash_next_step:
            self.crash_next_step = False
            raise RuntimeError("sim crashed during step")
        return super().step(action, which_arm)


def test_retry_succeeds_after_failures():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ValueError("boom")
        return 42

    assert retry(flaky, attempts=5, delay=0.0) == 42
    assert len(calls) == 3


def test_retry_exhausts():
    with pytest.raises(ValueError):
        retry(lambda: (_ for _ in ()).throw(ValueError("x")),
              attempts=2, delay=0.0)


def test_recovering_env_restarts_on_reset_crash():
    made = []

    def factory():
        env = FlakyEnv(fail_resets=1 if not made else 0, image_size=8,
                       episode_length=4)
        env.launch()
        made.append(env)
        return env

    env = RecoveringEnv(factory, max_restarts=3, retry_delay=0.0)
    obs = env.reset()
    assert "wrist_rgb" in obs
    # the env WAS rebuilt once, and the per-incident budget re-armed on the
    # successful reset (a later unrelated crash gets the full budget again)
    assert len(made) == 2 and env.restarts == 0


def test_recovering_env_step_crash_ends_episode():
    def factory():
        env = FlakyEnv(fail_resets=0, image_size=8, episode_length=4)
        env.launch()
        return env

    env = RecoveringEnv(factory, max_restarts=2, retry_delay=0.0)
    env.reset()
    env._env.crash_next_step = True
    t = env.step(np.r_[0.3, 0.0, 1.0, 0, 0, 0, 1, 1.0, 1.0], "right")
    assert t.terminal and t.info.get("env_crash")
    # and the env is usable again
    t2 = env.step(np.r_[0.3, 0.0, 1.0, 0, 0, 0, 1, 1.0, 1.0], "right")
    assert "wrist_rgb" in t2.observation


def test_recovering_env_gives_up():
    def factory():
        env = FlakyEnv(fail_resets=99, image_size=8, episode_length=4)
        env.launch()
        return env

    env = RecoveringEnv(factory, max_restarts=2, retry_delay=0.0)
    with pytest.raises(RuntimeError, match="giving up"):
        env.reset()


def test_step_timer():
    t = StepTimer()
    with t.time("sample"):
        pass
    with t.time("step"):
        pass
    s = t.summary()
    assert "time/sample_s" in s and "time/step_s" in s
    assert t.last("sample") >= 0


def test_host_gauges():
    g = host_gauges()
    assert isinstance(g, dict)  # psutil optional; present -> has rss
    if g:
        assert g["host/rss_gb"] > 0
