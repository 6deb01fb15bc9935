"""Diff the policy's TRAINING inputs against its PROBE/EVAL inputs, keyframe by
keyframe, for one task episode. The open-loop probe showed the trained
open_drawer policy emitting the PREVIOUS keyframe's action from step 3 on even
with --train-time, while train loss is ~0 — so some input feature must differ
between the replay transition (built from raw demo frames,
fill_replay.add_keypoints_to_replay) and the observation the env hands back
after stepping the discretized oracle action (probe_policy_open_loop /
runners/rollout.py). This prints, per dominant-arm keyframe: proprio vectors,
and per-camera rgb/pcd tensor distances, train vs probe.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from oracle_protocol_check import continuous_from_discrete  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="open_drawer")
    ap.add_argument("--episode", type=int, default=0)
    ap.add_argument("--voxel-size", type=int, default=50)
    ap.add_argument("--crop-radius", type=float, default=0.3)
    ap.add_argument("--episode-length", type=int, default=25)
    args = ap.parse_args()

    from voxactb_tpu.data.fill_replay import (
        discretize_keyframe, scene_bounds_from_crop_np)
    from voxactb_tpu.sim.environment import BimanualTaskEnvironment
    from voxactb_tpu.sim.tasks import TASK_REGISTRY
    from voxactb_tpu.utils.keypoints import KeypointConfig, keypoint_discovery
    from voxactb_tpu.utils.observation import extract_obs

    env = BimanualTaskEnvironment(
        TASK_REGISTRY[args.task], cameras=["wrist", "wrist2"], image_size=32,
        episode_length=args.episode_length, seed=43)
    frames, _ = env.get_demo(args.episode)
    dominant = env.dominant_arm()
    assistive = "left" if dominant == "right" else "right"
    kcfg = KeypointConfig(no_duplicate=True)
    per_arm = {
        dominant: keypoint_discovery(frames, which_arm="dominant",
                                     dominant_assistive_arm=dominant,
                                     cfg=kcfg)[0],
        assistive: keypoint_discovery(frames, which_arm="assistive",
                                      dominant_assistive_arm=assistive,
                                      cfg=kcfg)[0],
    }
    print(f"dominant={dominant} keypoints={per_arm}")

    obs0 = env.reset_to_demo(args.episode)
    crop_point = env.target_object_world_coords()
    bounds = scene_bounds_from_crop_np(args.crop_radius, crop_point)

    # --- TRAIN-side inputs: demo frame at previous keyframe, extract_obs(t=k)
    train_inputs = {}  # (arm, k) -> obs_dict
    targets = {}
    for arm, kps in per_arm.items():
        prev = 0
        for k, kp in enumerate(kps):
            mode = "dominant" if arm == dominant else "assistive"
            d = extract_obs(frames[prev], ["wrist", "wrist2"], t=k,
                            episode_length=args.episode_length,
                            which_arm=mode)
            train_inputs[(arm, k)] = d
            t_idx, rot_grip, _, _ = discretize_keyframe(
                frames[kp], frames[max(kp - 1, 0)], bounds, args.voxel_size,
                5, arm)
            targets[(arm, k)] = (t_idx, rot_grip)
            prev = kp

    # --- PROBE-side inputs: env stepping along the oracle, extract_obs(t=step?)
    # replicate the probe's alternation + the agent's own extract path: the
    # agent gets the env observation DICT (already extracted by the env);
    # compare the fields the q-net consumes.
    queues = {arm: list(kps) for arm, kps in per_arm.items()}
    kf_counter = {dominant: 0, assistive: 0}
    obs = obs0
    for step in range(args.episode_length):
        arm = assistive if step % 2 == 0 else dominant
        if not queues[arm]:
            if not queues[dominant] and not queues[assistive]:
                break
            continue
        kp = queues[arm].pop(0)
        k = kf_counter[arm]
        kf_counter[arm] += 1

        tr_in = train_inputs[(arm, k)]
        print(f"\n=== step {step} arm={arm} "
              f"({'dominant' if arm == dominant else 'assistive'}) kf#{k} "
              f"(demo frame {kp}) ===")
        pl = np.asarray(obs["low_dim_state"], np.float32)
        tl = np.asarray(tr_in["low_dim_state"], np.float32)
        print(f"  low_dim_state probe: {np.round(pl, 3).tolist()}")
        print(f"  low_dim_state train: {np.round(tl, 3).tolist()}")
        for cam in ("wrist", "wrist2"):
            for kind in ("rgb", "point_cloud"):
                a = np.asarray(obs[f"{cam}_{kind}"], np.float32).squeeze()
                b = np.asarray(tr_in[f"{cam}_{kind}"], np.float32).squeeze()
                if a.shape != b.shape:
                    print(f"  {cam}_{kind}: SHAPE {a.shape} vs {b.shape}")
                    continue
                d = np.abs(a - b)
                print(f"  {cam}_{kind}: max|d|={d.max():.4f} "
                      f"mean|d|={d.mean():.5f} frac>{0.05}={np.mean(d > 0.05):.3f}")

        t_idx, rot_grip = targets[(arm, k)]
        action = continuous_from_discrete(t_idx, rot_grip, bounds,
                                          args.voxel_size, 5)
        tr = env.step(action, arm)
        obs = dict(tr.observation)
        if tr.terminal:
            break


if __name__ == "__main__":
    main()
