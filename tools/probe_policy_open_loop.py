"""Open-loop policy probe: drive the env along the ORACLE (discretized-demo)
trajectory and, at every step, ask the trained policy what IT would do — without
letting its answer affect the world. The per-step prediction error vs the oracle
action separates "the policy never learned the keyframe map" from "the policy is
fine open-loop but drifts closed-loop" — the two failure modes a bare 0.0
success rate cannot distinguish (the reference's analogous offline check is
eval_real.py:1059-1115's positional/angular/gripper errors vs val demos).

Run:
  python tools/probe_policy_open_loop.py --task open_drawer \
      --acting-dir eval_artifacts/open_drawer/train_dominant/open_drawer/PERACT_BC/seed0 \
      --stab-dir  eval_artifacts/open_drawer/train_assistive/open_drawer/PERACT_BC/seed0 \
      --ckpt-step 4000 --episodes 3 [--live]

--live additionally rolls a normal closed-loop episode (predictions DO step the
env) and prints the step at which it diverges from the oracle path.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")

from oracle_protocol_check import continuous_from_discrete  # noqa: E402


def load_agent(seed_dir, step, which):
    from voxactb_tpu.agents.qattention_agent import QAttentionBCAgent
    from voxactb_tpu.config import Config

    cfg = Config.load(os.path.join(seed_dir, "config.json"))
    agent = QAttentionBCAgent(cfg.method, cfg.rlbench.cameras,
                              cfg.rlbench.scene_bounds)
    agent.build(training=False)
    agent.load_weights(os.path.join(seed_dir, "weights", str(step)))
    print(f"loaded {which} <- {seed_dir}/weights/{step}", flush=True)
    return agent, cfg


def _rewrite_time(obs, t, episode_length):
    """Overwrite the proprio time channel with the TRAIN-side value.

    Training fills the channel with (1 - k/(T-1))*2-1 where k is the per-arm
    KEYFRAME index (fill_replay -> extract_obs t=k); eval uses the global
    rollout step (environment.py _observation_dict t=_step_count) — the same
    train/eval inconsistency the reference has (launch_utils.py:379 t=k vs
    custom_rlbench_env_two_robots.py:103 t=self._i). This hypothesis probe
    feeds the policy the time value it was TRAINED to see at this keyframe;
    if predictions snap to the oracle targets, the policy is keying on the
    time channel and the mismatch is the eval failure.
    """
    time_ch = (1.0 - t / max(1, episode_length - 1)) * 2.0 - 1.0
    obs = dict(obs)
    for key in ("low_dim_state_right_arm", "low_dim_state_left_arm"):
        v = np.array(obs[key], np.float32)
        v[..., 3] = time_ch
        obs[key] = v
    v = np.array(obs["low_dim_state"], np.float32)
    v[..., 6] = time_ch
    obs["low_dim_state"] = v
    return obs


def probe_episode(env, agents, ep, voxel_size, rot_res, crop_radius,
                  episode_length, no_duplicate=False, train_time=False):
    from voxactb_tpu.data.fill_replay import (
        discretize_keyframe,
        scene_bounds_from_crop_np,
    )
    from voxactb_tpu.utils.keypoints import KeypointConfig, keypoint_discovery

    kcfg = KeypointConfig(no_duplicate=no_duplicate)
    frames, _ = env.get_demo(ep)
    dominant = env.dominant_arm()
    assistive = "left" if dominant == "right" else "right"
    per_arm = {
        dominant: keypoint_discovery(frames, which_arm="dominant",
                                     dominant_assistive_arm=dominant,
                                     cfg=kcfg)[0],
        assistive: keypoint_discovery(frames, which_arm="assistive",
                                      dominant_assistive_arm=assistive,
                                      cfg=kcfg)[0],
    }

    obs = env.reset_to_demo(ep)
    crop_point = env.target_object_world_coords()
    bounds = scene_bounds_from_crop_np(crop_radius, crop_point)

    queues = {"right": [], "left": []}
    for arm, kps in per_arm.items():
        for kp in kps:
            t_idx, rot_grip, _, _ = discretize_keyframe(
                frames[kp], frames[max(kp - 1, 0)], bounds, voxel_size,
                rot_res, arm)
            queues[arm].append((
                np.asarray(t_idx), np.asarray(rot_grip),
                continuous_from_discrete(t_idx, rot_grip, bounds, voxel_size,
                                         rot_res)))

    rows = []
    res = (np.asarray(bounds[3:]) - np.asarray(bounds[:3])) / voxel_size
    kf_counter = {"right": 0, "left": 0}
    for step in range(episode_length):
        arm = assistive if step % 2 == 0 else dominant
        q = queues[arm]
        if not q:
            if not queues[dominant] and not queues[assistive]:
                break
            continue
        t_idx, rot_grip, action = q.pop(0)

        agent = agents["dominant"] if arm == dominant else agents["assistive"]
        obs_in = (_rewrite_time(obs, kf_counter[arm], episode_length)
                  if train_time else dict(obs))
        kf_counter[arm] += 1
        pred = agent.act(step, obs_in, deterministic=True, which_arm=arm,
                         new_scene_bounds=np.asarray(bounds).tolist(),
                         dominant_assitive_policy=True)
        p_t = np.asarray(pred.observation_elements["trans_action_indicies"])
        p_rg = np.asarray(pred.observation_elements["rot_grip_action_indicies"])
        rows.append({
            "step": step, "arm": arm,
            "role": "dominant" if arm == dominant else "assistive",
            "trans_idx_err": (p_t - t_idx).tolist(),
            "pos_err_cm": float(np.linalg.norm((p_t - t_idx) * res) * 100),
            "rot_idx_err": (p_rg[:3] - rot_grip[:3]).tolist(),
            "grip_pred": int(p_rg[3]), "grip_target": int(rot_grip[3]),
        })
        tr = env.step(action, arm)  # oracle action keeps us on the demo path
        obs = dict(tr.observation)
        if tr.terminal:
            break
    return rows


def live_episode(env, agents, ep, crop_radius, episode_length):
    from voxactb_tpu.data.fill_replay import scene_bounds_from_crop_np

    obs = env.reset_to_demo(ep)
    crop_point = env.target_object_world_coords()
    bounds = scene_bounds_from_crop_np(crop_radius, crop_point)
    dominant = env.dominant_arm()
    assistive = "left" if dominant == "right" else "right"

    reward, log = 0.0, []
    for step in range(episode_length):
        arm = assistive if step % 2 == 0 else dominant
        agent = agents["dominant"] if arm == dominant else agents["assistive"]
        pred = agent.act(step, dict(obs), deterministic=True, which_arm=arm,
                         new_scene_bounds=np.asarray(bounds).tolist(),
                         dominant_assitive_policy=True)
        act = np.asarray(pred.action)
        try:
            tr = env.step(act, arm)
        except Exception as e:  # noqa: BLE001
            log.append(f"step {step} {arm}: step error {e!r}")
            break
        log.append(f"step {step} {arm}: pos={np.round(act[:3], 3).tolist()} "
                   f"grip={act[7]:.0f} reward={tr.reward}")
        reward = max(reward, tr.reward)
        obs = dict(tr.observation)
        if tr.terminal:
            break
    return reward, log


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="open_drawer")
    ap.add_argument("--acting-dir", required=True)
    ap.add_argument("--stab-dir", required=True)
    ap.add_argument("--ckpt-step", type=int, required=True)
    ap.add_argument("--stab-step", type=int, default=None)
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--seed", type=int, default=43)
    ap.add_argument("--crop-radius", type=float, default=0.3)
    ap.add_argument("--live", action="store_true")
    ap.add_argument("--train-time", action="store_true",
                    help="feed the policy the TRAIN-side time channel "
                         "(per-arm keyframe index) instead of the eval-side "
                         "rollout step — isolates the time-channel mismatch")
    args = ap.parse_args()

    from voxactb_tpu.sim.environment import BimanualTaskEnvironment
    from voxactb_tpu.sim.tasks import TASK_REGISTRY

    acting, cfg = load_agent(args.acting_dir, args.ckpt_step, "acting")
    stab, _ = load_agent(args.stab_dir, args.stab_step or args.ckpt_step,
                         "stabilizing")
    agents = {"dominant": acting, "assistive": stab}

    env = BimanualTaskEnvironment(
        TASK_REGISTRY[args.task], cameras=cfg.rlbench.cameras,
        image_size=cfg.rlbench.camera_resolution[0],
        episode_length=cfg.rlbench.episode_length, seed=args.seed)

    for ep in range(args.episodes):
        rows = probe_episode(env, agents, ep, cfg.method.voxel_sizes[0],
                             cfg.method.rotation_resolution, args.crop_radius,
                             cfg.rlbench.episode_length,
                             no_duplicate=cfg.method
                             .keypoint_discovery_no_duplicate,
                             train_time=args.train_time)
        print(f"\n=== episode {ep} (open-loop on oracle path) ===")
        for r in rows:
            print(json.dumps(r))
        if args.live:
            reward, log = live_episode(env, agents, ep, args.crop_radius,
                                       cfg.rlbench.episode_length)
            print(f"--- episode {ep} live rollout: reward={reward} ---")
            for line in log:
                print(" ", line)


if __name__ == "__main__":
    main()
