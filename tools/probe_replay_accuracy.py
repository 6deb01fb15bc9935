"""Exact-match accuracy of a trained policy ON ITS OWN REPLAY SAMPLES.

Train loss ~0 but open-loop keyframe errors (probe_policy_open_loop) can mean
two different things: (a) the replay targets are learned perfectly and eval
inputs are off the training manifold (fix = data coverage / augmentation), or
(b) the replay itself contains conflicting or misaligned samples the CE loss
averages over. This rebuilds the replay EXACTLY as cli/train.py does (same
config, same demos, same scanner), runs the trained q-net on every stored
sample, and reports exact-match rates for trans voxel index and grip bit.

Run:  python tools/probe_replay_accuracy.py --task put_item_in_drawer \
          --seed-dir eval_artifacts/put_item_in_drawer/train_dominant/.../seed0
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
    ap.add_argument("--task", default="put_item_in_drawer")
    ap.add_argument("--seed-dir", required=True)
    ap.add_argument("--ckpt-step", type=int, default=5999)
    ap.add_argument("--max-samples", type=int, default=0,
                    help="0 = all stored samples")
    args = ap.parse_args()

    from probe_policy_open_loop import load_agent

    from voxactb_tpu.cli import train as train_cli
    from voxactb_tpu.config import Config

    agent, cfg = load_agent(args.seed_dir, args.ckpt_step, "policy")

    # rebuild the replay through the same entry the training leg used
    cfg2 = Config.load(os.path.join(args.seed_dir, "config.json"))
    replay, _ = train_cli.build_replay_and_agent(cfg2)
    n = replay.size
    print(f"replay rebuilt: {n} samples", flush=True)

    idxs = range(n if not args.max_samples else min(n, args.max_samples))
    hit_t, hit_g, total = 0, 0, 0
    worst = []
    for i in idxs:
        s = {k: v[0] for k, v in replay.gather(np.asarray([i])).items()}
        rgbs = tuple(np.asarray(s[f"{c}_rgb"], np.float32)[None]
                     for c in cfg.rlbench.cameras)
        pcds = tuple(np.asarray(s[f"{c}_point_cloud"], np.float32)[None]
                     for c in cfg.rlbench.cameras)
        proprio = np.asarray(s["low_dim_state"], np.float32)[None]
        proprio = proprio[:, : agent._cfg.proprio_width()]
        lang_goal = np.asarray(s["lang_goal_emb"], np.float32)[None]
        lang_tok = np.asarray(s["lang_token_embs"], np.float32)[None]
        bounds = np.asarray(
            s["target_object_scene_bounds"]
            if "target_object_scene_bounds" in s
            else cfg2.rlbench.scene_bounds, np.float32).reshape(1, 6)
        out = agent._infer(agent._params, rgbs, pcds, proprio, lang_goal,
                           lang_tok, bounds)
        p_t = np.asarray(out.trans_idx)[0]
        p_rg = np.asarray(out.rot_grip_idx)[0]
        t_t = np.asarray(s["trans_action_indicies"])[:3]
        t_g = int(np.asarray(s["rot_grip_action_indicies"])[3])
        dt = int(np.abs(p_t - t_t).sum())
        ok_t = dt == 0
        ok_g = int(p_rg[3]) == t_g
        hit_t += ok_t
        hit_g += ok_g
        total += 1
        if not (ok_t and ok_g):
            worst.append({"i": int(i), "dt": dt,
                          "grip": f"{int(p_rg[3])}/{t_g}"})
    print(json.dumps({
        "task": args.task, "samples": total,
        "trans_exact": round(hit_t / max(1, total), 4),
        "grip_exact": round(hit_g / max(1, total), 4),
        "misses": worst[:20],
    }, indent=1))


if __name__ == "__main__":
    main()
