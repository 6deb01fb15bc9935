"""Detect CONFLICTING samples in a task's replay: pairs whose policy-visible
inputs are (near-)identical but whose targets differ.

probe_replay_accuracy separates "policy never learned the replay" from "eval is
off-manifold"; this probe separates the two causes of the former: (a) capacity
underfit (inputs distinct, net too small) vs (b) label ambiguity (inputs
indistinguishable, CE averages over conflicting targets and exact-match caps
out). The input signature is exactly what the q-net can see: the voxelized
occupancy+rgb grid under the sample's own crop bounds, plus proprio and the
time channel (extract_obs contract; the reference net sees nothing else —
perceiver_lang_io.py:345-485).

Run:  python tools/probe_replay_ambiguity.py --task hand_over_item \
          --seed-dir eval_artifacts/hand_over_item/train_assistive/.../seed0
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="hand_over_item")
    ap.add_argument("--seed-dir", required=True)
    ap.add_argument("--voxel", type=int, default=50)
    ap.add_argument("--near", type=float, default=2.0,
                    help="voxel-grid L0 distance (changed cells) below which "
                         "two inputs count as indistinguishable")
    args = ap.parse_args()

    from voxactb_tpu.cli import train as train_cli
    from voxactb_tpu.config import Config

    cfg = Config.load(os.path.join(args.seed_dir, "config.json"))
    replay, _ = train_cli.build_replay_and_agent(cfg)
    n = replay.size
    cams = cfg.rlbench.cameras
    print(f"replay rebuilt: {n} samples", flush=True)

    # cheap input signature: voxel occupancy grid (bool) at the sample's own
    # bounds + proprio vector. Occupancy is what dominates the q-net's input.
    sigs, grids, metas = [], [], []
    N = args.voxel
    for i in range(n):
        s = {k: v[0] for k, v in replay.gather(np.asarray([i])).items()}
        pts = np.concatenate([np.asarray(s[f"{c}_point_cloud"], np.float32)
                              .reshape(-1, 3) for c in cams], 0)
        b = np.asarray(s.get("target_object_scene_bounds",
                             cfg.rlbench.scene_bounds), np.float32)
        res = (b[3:] - b[:3]) / N
        idx = np.floor((pts - b[:3]) / res).astype(np.int64)
        ok = np.all((idx >= 0) & (idx < N), 1)
        flat = np.unique(idx[ok] @ np.array([N * N, N, 1]))
        grids.append(flat)
        prop = np.asarray(s["low_dim_state"], np.float32).ravel()
        sigs.append(prop)
        metas.append({
            "i": i,
            "trans": np.asarray(s["trans_action_indicies"]).tolist(),
            # continuous world-frame target translation: comparable across
            # samples even when their per-sample crop bounds differ (the
            # voxel indices are crop-relative, so an index delta can be a
            # bounds shift rather than a real target conflict)
            "pose": np.asarray(s["gripper_pose"], np.float32)[:3].tolist(),
            "res_m": float(res.max()),
            "grip": int(np.asarray(s["rot_grip_action_indicies"]).ravel()[3]),
            "time": float(prop[-2]) if prop.size >= 2 else None,
            "points_in_bounds": int(ok.sum()),
            "terminal": bool(np.asarray(s["terminal"]).ravel()[0]),
        })

    conflicts, near_total = [], 0
    for i in range(n):
        for j in range(i + 1, n):
            a, b2 = grids[i], grids[j]
            # symmetric difference of occupied cells
            d_occ = len(np.setdiff1d(a, b2, assume_unique=True)) + \
                len(np.setdiff1d(b2, a, assume_unique=True))
            d_prop = float(np.max(np.abs(sigs[i] - sigs[j])))
            if d_occ <= args.near and d_prop < 0.05:
                near_total += 1
                # conflict = same inputs, targets > 1 voxel apart in WORLD
                # meters (continuous gripper_pose, robust to per-sample crop
                # bounds shifts) or opposite grip bits
                pi = np.asarray(metas[i]["pose"])
                pj = np.asarray(metas[j]["pose"])
                d_m = float(np.linalg.norm(pi - pj))
                res_m = max(metas[i]["res_m"], metas[j]["res_m"])
                dg = metas[i]["grip"] != metas[j]["grip"]
                if d_m > res_m or dg:
                    conflicts.append({
                        "i": i, "j": j, "d_occ": int(d_occ),
                        "d_prop": round(d_prop, 4),
                        "d_target_cm": round(d_m * 100, 2),
                        "grip": f"{metas[i]['grip']}vs{metas[j]['grip']}",
                        "trans_i": metas[i]["trans"],
                        "trans_j": metas[j]["trans"],
                    })

    print(json.dumps({
        "task": args.task, "samples": n,
        "near_duplicate_pairs": near_total,
        "conflicting_pairs": len(conflicts),
        "examples": conflicts[:25],
        "per_sample_points_in_bounds": {
            "min": int(min(m["points_in_bounds"] for m in metas)),
            "median": int(np.median([m["points_in_bounds"] for m in metas])),
            "max": int(max(m["points_in_bounds"] for m in metas)),
        },
    }, indent=1))


if __name__ == "__main__":
    main()
