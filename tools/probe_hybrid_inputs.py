"""Bisect the open_drawer eval failure to an input feature.

probe_policy_open_loop showed the trained pair predicting the PREVIOUS
keyframe's action from step 3 on (train loss ~0, --train-time no effect);
probe_input_diff showed the camera tensors differ heavily between the replay's
training inputs (raw demo frames) and the env state along the discretized
oracle. This probe runs the acting agent on four input variants per dominant
keyframe:

  probe        env obs as the rollout sees it (reproduces the failure)
  train        demo-frame cameras + demo proprio + per-arm-kf time (replay view)
  cam-train    env proprio, demo-frame cameras
  prop-train   env cameras, demo proprio/time

Whichever swap snaps predictions to the oracle names the feature that breaks
closed-loop eval.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")

from oracle_protocol_check import continuous_from_discrete  # noqa: E402
from probe_policy_open_loop import load_agent  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="open_drawer")
    ap.add_argument("--acting-dir", required=True)
    ap.add_argument("--stab-dir", required=True)
    ap.add_argument("--ckpt-step", type=int, required=True)
    ap.add_argument("--episodes", type=int, default=2)
    ap.add_argument("--episode-length", type=int, default=25)
    args = ap.parse_args()

    from voxactb_tpu.config import Config
    from voxactb_tpu.data.fill_replay import (
        discretize_keyframe, scene_bounds_from_crop_np)
    from voxactb_tpu.sim.environment import BimanualTaskEnvironment
    from voxactb_tpu.sim.tasks import TASK_REGISTRY
    from voxactb_tpu.utils.keypoints import KeypointConfig, keypoint_discovery
    from voxactb_tpu.utils.observation import extract_obs

    acting, cfg = load_agent(args.acting_dir, args.ckpt_step, "acting")
    stab, _ = load_agent(args.stab_dir, args.ckpt_step, "stabilizing")
    voxel_size = cfg.method.voxel_sizes[0]
    rot_res = cfg.method.rotation_resolution
    nd = getattr(cfg.method, "keypoint_discovery_no_duplicate", False)
    cams = list(cfg.rlbench.cameras)

    env = BimanualTaskEnvironment(
        TASK_REGISTRY[args.task], cameras=cams,
        image_size=cfg.rlbench.camera_resolution[0],
        episode_length=args.episode_length, seed=43)

    for ep in range(args.episodes):
        frames, _ = env.get_demo(ep)
        dominant = env.dominant_arm()
        assistive = "left" if dominant == "right" else "right"
        kcfg = KeypointConfig(no_duplicate=nd)
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
        bounds = scene_bounds_from_crop_np(0.3, crop_point)

        queues = {arm: list(kps) for arm, kps in per_arm.items()}
        prev_kp = {dominant: 0, assistive: 0}
        kf_counter = {dominant: 0, assistive: 0}
        print(f"\n######## episode {ep} dominant={dominant} "
              f"kps={per_arm} ########")
        for step in range(args.episode_length):
            arm = assistive if step % 2 == 0 else dominant
            if not queues[arm]:
                if not queues[dominant] and not queues[assistive]:
                    break
                continue
            kp = queues[arm].pop(0)
            k = kf_counter[arm]
            kf_counter[arm] += 1
            mode = "dominant" if arm == dominant else "assistive"
            agent = acting if arm == dominant else stab

            t_idx, rot_grip, _, _ = discretize_keyframe(
                frames[kp], frames[max(kp - 1, 0)], bounds, voxel_size,
                rot_res, arm)
            action = continuous_from_discrete(t_idx, rot_grip, bounds,
                                              voxel_size, rot_res)

            # the replay-side view of this keyframe
            d = extract_obs(frames[prev_kp[arm]], cams, t=k,
                            episode_length=args.episode_length,
                            which_arm=mode)
            ld = np.asarray(d["low_dim_state"], np.float32)
            tch = ld[6]
            train_left = np.concatenate([ld[:3], [tch]]).astype(np.float32)
            train_right = np.concatenate([ld[3:6], [tch]]).astype(np.float32)

            variants = {}
            variants["probe"] = dict(obs)
            v = dict(obs)
            for c in cams:
                v[f"{c}_rgb"] = d[f"{c}_rgb"]
                v[f"{c}_point_cloud"] = d[f"{c}_point_cloud"]
            variants["cam-train"] = v
            v2 = dict(obs)
            v2["low_dim_state_left_arm"] = train_left
            v2["low_dim_state_right_arm"] = train_right
            variants["prop-train"] = v2
            v3 = dict(v)
            v3["low_dim_state_left_arm"] = train_left
            v3["low_dim_state_right_arm"] = train_right
            variants["train"] = v3

            row = {"step": step, "arm": mode, "kf": k}
            for name, vobs in variants.items():
                pred = agent.act(step, vobs, deterministic=True,
                                 which_arm=arm,
                                 new_scene_bounds=np.asarray(bounds).tolist(),
                                 dominant_assitive_policy=True)
                p_t = np.asarray(
                    pred.observation_elements["trans_action_indicies"])
                p_rg = np.asarray(
                    pred.observation_elements["rot_grip_action_indicies"])
                row[name] = (f"dt={np.abs(p_t - t_idx).sum()} "
                             f"grip={int(p_rg[3])}/{int(rot_grip[3])}")
            print(row, flush=True)

            prev_kp[arm] = kp
            tr = env.step(action, arm)
            obs = dict(tr.observation)
            if tr.terminal:
                break


if __name__ == "__main__":
    main()
