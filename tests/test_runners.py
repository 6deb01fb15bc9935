"""Integration: train runner (resume/rotation), rollout branches, eval sweep."""

import os

import numpy as np
import pytest

from voxactb_tpu.agents.qattention_agent import QAttentionBCAgent
from voxactb_tpu.config import MethodConfig
from voxactb_tpu.envs.fake_env import FakeBimanualEnv
from voxactb_tpu.replay import UniformReplayBuffer, bc_replay_signature
from voxactb_tpu.replay.dataset import PrefetchIterator
from voxactb_tpu.runners.eval_runner import EvalRunner, select_checkpoints
from voxactb_tpu.runners.rollout import RolloutGenerator
from voxactb_tpu.runners.train_runner import OfflineTrainRunner

CAMERAS = ["wrist", "wrist2"]
BOUNDS = [-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]
IMG = 16


def tiny_cfg(**kw):
    base = dict(
        voxel_sizes=[10], num_latents=16, latent_dim=32, transformer_depth=1,
        cross_dim_head=16, latent_dim_head=16, final_dim=8, lr=1e-3,
        which_arm="dominant", arm_pred_loss=True, apply_se3=False,
    )
    base.update(kw)
    return MethodConfig(**base)


def fill_buffer(rng, cfg, n=6):
    buf = UniformReplayBuffer(
        32, bc_replay_signature(CAMERAS, (IMG, IMG), cfg.low_dim_size(),
                                arm_pred_loss=True))
    for i in range(n):
        t = {
            "low_dim_state": rng.normal(size=(cfg.low_dim_size(),)),
            "trans_action_indicies": rng.integers(0, 10, (3,)),
            "rot_grip_action_indicies": np.r_[rng.integers(0, 72, 3),
                                              rng.integers(0, 2)],
            "ignore_collisions": [1],
            "gripper_pose": np.r_[rng.uniform(-0.3, 0.7, 3), 0, 0, 0, 1],
            "lang_goal_emb": rng.normal(size=(1024,)),
            "lang_token_embs": rng.normal(size=(77, 512)),
            "task_id": 0, "label": [i % 2],
        }
        for c in CAMERAS:
            t[f"{c}_rgb"] = rng.integers(0, 255, (IMG, IMG, 3))
            t[f"{c}_point_cloud"] = rng.uniform(-0.5, 1.5, (IMG, IMG, 3))
        buf.add(t)
    return buf


def make_dataset(buf, batch=2):
    def sample():
        b = buf.sample_transition_batch(batch)
        b["scene_bounds"] = np.asarray(BOUNDS, np.float32)
        return b
    return PrefetchIterator(sample)


def test_train_runner_saves_rotates_and_resumes(tmp_path, rng):
    cfg = tiny_cfg()
    buf = fill_buffer(rng, cfg)
    agent = QAttentionBCAgent(cfg, CAMERAS, BOUNDS, batch_size=2,
                              training_iterations=6)
    ds = make_dataset(buf)
    runner = OfflineTrainRunner(
        agent, ds, str(tmp_path / "logs"), str(tmp_path / "weights"),
        training_iterations=6, save_freq=2, log_freq=2, num_weights_to_keep=2,
    )
    runner.start()
    ds.close()
    saved = sorted(os.listdir(tmp_path / "weights"), key=int)
    # rotation keeps 2 plus the final save
    assert len(saved) <= 3 and "5" in saved

    # resume: a fresh runner should pick up from the last save and do nothing more
    agent2 = QAttentionBCAgent(cfg, CAMERAS, BOUNDS, batch_size=2,
                               training_iterations=6)
    ds2 = make_dataset(buf)
    runner2 = OfflineTrainRunner(
        agent2, ds2, str(tmp_path / "logs"), str(tmp_path / "weights"),
        training_iterations=6, save_freq=2, log_freq=2,
    )
    agent2.build(training=True)
    assert runner2.resume_step() == 6
    ds2.close()
    assert os.path.exists(tmp_path / "logs" / "train_data.csv")


def test_rollout_dominant_assistive_alternation(rng):
    cfg = tiny_cfg()
    env = FakeBimanualEnv(image_size=IMG, episode_length=6, seed=3)
    env.launch()
    acting = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    stabilizing = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    acting.build(training=False)
    stabilizing.build(training=False)

    gen = RolloutGenerator()
    transitions = list(gen.generator(
        env, acting, episode_length=4, left_arm_agent=stabilizing,
        which_arm="dominant_assistive", crop_target_obj_voxel=True,
        crop_radius=0.3,
    ))
    assert len(transitions) >= 1
    dom = env.dominant_arm()
    assistive = "left" if dom == "right" else "right"
    arms = [arm for _, arm, _ in env.step_log]
    # assistive acts on even steps, dominant on odd (rollout_generator.py:233-239)
    expected = [assistive if i % 2 == 0 else dom for i in range(len(arms))]
    assert arms == expected
    # actions stay inside the cropped scene bounds
    crop = np.asarray(env.target_object_world_coords())
    for _, _, action in env.step_log:
        assert np.all(np.abs(action[:3] - np.round(crop, 2)) <= 0.3 + 1e-6)
    # last transition is terminal (success or timeout)
    assert transitions[-1].terminal


def test_rollout_single_arm_branch(rng):
    cfg = tiny_cfg(which_arm="right", arm_pred_loss=False)
    env = FakeBimanualEnv(image_size=IMG, episode_length=3, seed=1)
    env.launch()
    agent = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    agent.build(training=False)
    gen = RolloutGenerator()
    transitions = list(gen.generator(
        env, agent, episode_length=3, which_arm="right",
        crop_target_obj_voxel=False,
    ))
    assert transitions and transitions[-1].terminal
    assert all(arm == "right" for _, arm, _ in env.step_log)


def test_eval_runner_sweep_and_skip(tmp_path, rng):
    cfg = tiny_cfg()
    # save two fake checkpoints
    agent = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    agent.build(training=False)
    env = FakeBimanualEnv(image_size=IMG, episode_length=3, seed=2)
    env.launch()
    # initialize params via one act
    obs = env.reset()
    agent.act(0, obs, which_arm="dominant", dominant_assitive_policy=True)
    for step in (0, 2):
        d = tmp_path / "weights" / str(step)
        agent.save_weights(str(d))

    stabilizing = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    runner = EvalRunner(
        env, agent, str(tmp_path / "weights"), str(tmp_path / "logs"),
        left_arm_agent=stabilizing, eval_episodes=2, episode_length=3,
    )
    results = runner.start("missing")
    assert [r["step"] for r in results] == [0, 2]
    assert all("eval_envs/return" in r for r in results)

    # second run: everything already scored
    results2 = runner.start("missing")
    assert results2 == []

    # best/last selection
    assert select_checkpoints(str(tmp_path / "weights"), "last",
                              str(tmp_path / "logs" / "eval_data.csv")) == [2]
    best = select_checkpoints(str(tmp_path / "weights"), "best",
                              str(tmp_path / "logs" / "eval_data.csv"))
    assert best and best[0] in (0, 2)


def test_rollout_both_arms_branch(rng):
    """crop + which_arm='both': two policies, fixed left/right alternation
    (rollout_generator.py:131-207)."""
    cfg = tiny_cfg(which_arm="right", arm_pred_loss=False)
    env = FakeBimanualEnv(image_size=IMG, episode_length=4, seed=5)
    env.launch()
    right = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    left = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    right.build(training=False)
    left.build(training=False)
    gen = RolloutGenerator()
    transitions = list(gen.generator(
        env, right, episode_length=4, left_arm_agent=left, which_arm="both",
        crop_target_obj_voxel=True, crop_radius=0.3,
    ))
    assert transitions and transitions[-1].terminal
    arms = [arm for _, arm, _ in env.step_log]
    expected = ["left" if i % 2 == 0 else "right" for i in range(len(arms))]
    assert arms == expected


def test_rollout_multiarm_branch(rng):
    """crop + multiarm: one policy, per-arm lang instruction keys
    (rollout_generator.py:299-374)."""
    cfg = tiny_cfg(which_arm="right", arm_pred_loss=False)
    env = FakeBimanualEnv(image_size=IMG, episode_length=4, seed=6)
    env.launch()
    agent = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    agent.build(training=False)
    gen = RolloutGenerator()
    transitions = list(gen.generator(
        env, agent, episode_length=4, which_arm="multiarm",
        crop_target_obj_voxel=True, crop_radius=0.3,
    ))
    assert transitions and transitions[-1].terminal
    # the agent sees multiarm_{left,right}; the env is stepped with the plain arm
    arms = [arm for _, arm, _ in env.step_log]
    expected = ["left" if i % 2 == 0 else "right" for i in range(len(arms))]
    assert arms == expected


def test_auto_crop_uses_env_radius(rng):
    """auto_crop pulls the env's object-derived radius (vlm.py:182-192 path)."""
    cfg = tiny_cfg()
    env = FakeBimanualEnv(image_size=IMG, episode_length=3, seed=7)
    env.launch()
    acting = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    stabilizing = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    acting.build(training=False)
    stabilizing.build(training=False)
    list(RolloutGenerator().generator(
        env, acting, episode_length=2, left_arm_agent=stabilizing,
        which_arm="dominant_assistive", crop_target_obj_voxel=True,
        crop_radius=999.0, auto_crop=True,  # huge manual radius must be ignored
    ))
    crop = np.round(np.asarray(env.target_object_world_coords()), 2)
    for _, _, action in env.step_log:
        assert np.all(np.abs(action[:3] - crop) <= env.auto_crop_radius() + 1e-6)


def test_stabilizing_sweep(tmp_path, rng):
    """best-acting x sweep-stabilizing dual selection (eval.py:206-241)."""
    cfg = tiny_cfg()
    env = FakeBimanualEnv(image_size=IMG, episode_length=3, seed=9)
    env.launch()
    acting = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    acting.build(training=False)
    obs = env.reset()
    acting.act(0, obs, which_arm="dominant", dominant_assitive_policy=True)
    acting.save_weights(str(tmp_path / "acting" / "0"))
    for s in (0, 1):
        acting.save_weights(str(tmp_path / "stab" / str(s)))

    stabilizing = QAttentionBCAgent(cfg, CAMERAS, BOUNDS)
    runner = EvalRunner(
        env, acting, str(tmp_path / "acting"), str(tmp_path / "logs"),
        left_arm_agent=stabilizing, eval_episodes=1, episode_length=3,
    )
    rows = runner.sweep_stabilizing(0, str(tmp_path / "stab"))
    assert [r["left_step"] for r in rows] == [0, 1]
    assert all(r["step"] == 0 for r in rows)
    assert os.path.exists(tmp_path / "logs" / "stabilizing_sweep.csv")

    # resume: a fresh runner skips the already-scored left steps and the CSV
    # keeps both original rows (restart mid-sweep must not rescore/truncate)
    acting.save_weights(str(tmp_path / "stab" / "2"))
    env2 = FakeBimanualEnv(image_size=IMG, episode_length=3, seed=9)
    env2.launch()
    runner2 = EvalRunner(
        env2, acting, str(tmp_path / "acting"), str(tmp_path / "logs"),
        left_arm_agent=stabilizing, eval_episodes=1, episode_length=3,
    )
    rows2 = runner2.sweep_stabilizing(0, str(tmp_path / "stab"))
    assert [r["left_step"] for r in rows2] == [2]
    import csv as _csv
    with open(tmp_path / "logs" / "stabilizing_sweep.csv") as f:
        all_rows = list(_csv.DictReader(f))
    assert [r["left_step"] for r in all_rows] == ["0", "1", "2"]


def test_time_limit_terminal_is_marked_timeout(rng):
    """The env terminates on its own time limit, so the rollout must still
    flag the transition as a timeout in replay (YARR rollout_generator.py:53)
    — a plain terminal=True would be indistinguishable from success/failure."""
    from voxactb_tpu.agents.base import ActResult

    class _MissAgent:
        def build(self, training=False):
            pass

        def act(self, step, obs, **kw):
            # never reaches the target, never closes the gripper
            return ActResult(np.r_[0.3, 0.0, 1.0, 0, 0, 0, 1, 1.0, 1.0])

    env = FakeBimanualEnv(image_size=IMG, episode_length=3, seed=1)
    env.launch()
    rts = list(RolloutGenerator().generator(
        env, _MissAgent(), episode_length=3, eval=True, which_arm="dominant"))
    assert rts[-1].terminal and rts[-1].timeout
    assert not any(r.timeout for r in rts[:-1])


class _ScriptedPlanner:
    """Fake VoxPoser planner: moves both arms toward the target."""

    def __init__(self):
        self.plan_calls = 0

    def plan(self, env, obs):
        self.plan_calls += 1
        target = env.target_object_world_coords()
        for arm in ("left", "right"):
            yield np.r_[target + [0, 0, 0.1], 0, 0, 0, 1, 1.0, 1.0], arm


class _SpyAgent:
    """Minimal agent recording when act() is first called relative to env steps."""

    def __init__(self, env, grip_flip_at=None):
        self._env = env
        self.first_act_step_count = None
        self._grip_flip_at = grip_flip_at
        self._n = 0

    def build(self, training=False):
        pass

    def act(self, step, obs, **kw):
        from voxactb_tpu.agents.base import ActResult

        if self.first_act_step_count is None:
            self.first_act_step_count = len(self._env.step_log)
        grip = 1.0
        if self._grip_flip_at is not None and self._n >= self._grip_flip_at:
            grip = 0.0
        self._n += 1
        a = np.r_[0.3, 0.0, 1.0, 0, 0, 0, 1, grip, 1.0]
        return ActResult(a)


def test_voxposer_prepositioning_runs_before_policy(rng):
    """VoxPoser pre-positioning (rollout_generator.py:103-110): planner actions
    move the arms BEFORE the first agent.act, without consuming episode budget."""
    env = FakeBimanualEnv(image_size=IMG, episode_length=4, seed=5)
    env.launch()
    planner = _ScriptedPlanner()
    agent = _SpyAgent(env)
    gen = RolloutGenerator()
    transitions = list(gen.generator(
        env, agent, episode_length=2, left_arm_agent=agent,
        which_arm="dominant_assistive", crop_target_obj_voxel=True,
        crop_radius=0.3, no_voxposer=False, planner=planner,
    ))
    assert planner.plan_calls == 1
    # the planner's 2 arm motions landed in the env BEFORE the first act
    assert agent.first_act_step_count == 2
    planner_arms = [arm for _, arm, _ in env.step_log[:2]]
    assert set(planner_arms) == {"left", "right"}
    assert transitions  # the learned policy still ran its episode


def test_no_voxposer_flag_skips_prepositioning(rng):
    env = FakeBimanualEnv(image_size=IMG, episode_length=4, seed=5)
    env.launch()
    planner = _ScriptedPlanner()
    agent = _SpyAgent(env)
    gen = RolloutGenerator()
    list(gen.generator(
        env, agent, episode_length=2, left_arm_agent=agent,
        which_arm="dominant_assistive", crop_target_obj_voxel=True,
        no_voxposer=True, planner=planner,
    ))
    assert planner.plan_calls == 0
    assert agent.first_act_step_count == 0


def test_openjar_gripper_switch_heuristic(rng):
    """Plain branch + OpenJar: left arm acts until its gripper bit flips, then
    control switches to the right arm (rollout_generator.py:540-608)."""
    env = FakeBimanualEnv(image_size=IMG, episode_length=8, seed=7,
                          task_name="OpenJar", success_radius=0.0)
    env.launch()
    agent = _SpyAgent(env, grip_flip_at=3)  # gripper closes on the 4th act
    gen = RolloutGenerator()
    list(gen.generator(env, agent, episode_length=8, which_arm="right",
                       crop_target_obj_voxel=False))
    arms = [arm for _, arm, _ in env.step_log]
    # steps 0-3 left (flip happens at step 3), 4+ right
    assert arms[:4] == ["left"] * 4
    assert set(arms[4:]) == {"right"}


def test_parallel_eval_overlaps_and_keeps_csv_contract(tmp_path, rng):
    """One process per checkpoint (eval.py:242-261): ≥2 ckpts overlap in wall
    clock, rows land in the same skip-scored CSV."""
    import time

    from voxactb_tpu.agents.base import ActResult, Agent

    spans_dir = tmp_path / "spans"
    os.makedirs(spans_dir, exist_ok=True)

    class SleepAgent(Agent):
        def build(self, training=False, device=None):
            pass

        def update(self, step, batch):
            return {}

        def act(self, step, observation, **kw):
            t0 = time.time()
            time.sleep(0.5)
            # record (pid, start, end) so overlap can be asserted from actual
            # execution intervals — robust to process-startup jitter under load
            with open(spans_dir / f"{os.getpid()}.log", "a") as f:
                f.write(f"{t0} {time.time()}\n")
            return ActResult(np.r_[0.3, 0.0, 1.0, 0, 0, 0, 1, 1.0, 1.0])

        def load_weights(self, savedir):
            pass

        def save_weights(self, savedir):
            pass

    for step in (0, 1, 2):
        os.makedirs(tmp_path / "weights" / str(step), exist_ok=True)

    env = FakeBimanualEnv(image_size=8, episode_length=2, seed=1)
    runner = EvalRunner(
        env, SleepAgent(), str(tmp_path / "weights"), str(tmp_path / "logs"),
        eval_episodes=1, episode_length=2, which_arm="right",
        crop_target_obj_voxel=False,
    )
    results = runner.start("missing", num_procs=3)
    assert [r["step"] for r in results] == [0, 1, 2]
    # gather per-process act intervals; ≥2 distinct workers must overlap in time
    spans = {}
    for fn in os.listdir(spans_dir):
        with open(spans_dir / fn) as f:
            spans[fn] = [tuple(map(float, ln.split())) for ln in f if ln.strip()]
    assert len(spans) >= 2, f"expected >=2 worker processes, saw {list(spans)}"
    pids = list(spans)
    overlapped = any(
        s0 < e1 and s1 < e0
        for i, a in enumerate(pids) for b in pids[i + 1:]
        for (s0, e0) in spans[a] for (s1, e1) in spans[b]
    )
    assert overlapped, f"no wall-clock overlap between workers: {spans}"
    # skip-scored contract intact: a second 'missing' run finds nothing
    assert runner.start("missing", num_procs=3) == []
