"""Per-stage decomposition of the BC train step at the canonical 50^3/batch-8
point, to locate the gap between measured step time and the cost model's SOL
(tools/cost_model.py::train_cost). Times, in ONE process (relay jitter makes
cross-process numbers untrustworthy):

  full          the bench train step (remat/aug per flags below)
  fwd_only      encoder forward + losses, no grad
  grad_only     value_and_grad, optimizer update skipped
  opt_only      LAMB update alone on precomputed grads
  vox_aug_only  SE(3) aug + voxelize (the pre-encoder data path)
plus A/B toggles: remat on/off, aug on/off.

Run after any bench finishes — never overlap TPU processes:
  python tools/profile_train.py [--batch 8] [--steps 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_batch(cfg, cameras, b: int, img: int = 128):
    rng = np.random.default_rng(0)
    batch = {
        "trans_action_indicies": rng.integers(0, 50, (b, 3)).astype(np.int32),
        "rot_grip_action_indicies": np.concatenate(
            [rng.integers(0, 72, (b, 3)), rng.integers(0, 2, (b, 1))], -1
        ).astype(np.int32),
        "ignore_collisions": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "gripper_pose": np.concatenate(
            [rng.uniform([-0.1, -0.3, 0.6], [0.4, 0.3, 1.0], (b, 3)),
             rng.normal(size=(b, 4))], -1).astype(np.float32),
        "lang_goal_emb": rng.normal(size=(b, 1024)).astype(np.float32),
        "lang_token_embs": rng.normal(size=(b, 77, 512)).astype(np.float32),
        "low_dim_state": rng.normal(size=(b, cfg.low_dim_size())).astype(
            np.float32),
        "label": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "scene_bounds": np.asarray([-0.3, -0.5, 0.4, 0.5, 0.5, 1.2], np.float32),
        "target_object_scene_bounds": np.tile(
            np.asarray([-0.1, -0.3, 0.5, 0.5, 0.3, 1.1], np.float32), (b, 1)),
    }
    batch["gripper_pose"][:, 3:] /= np.linalg.norm(
        batch["gripper_pose"][:, 3:], axis=-1, keepdims=True)
    for c in cameras:
        batch[f"{c}_rgb"] = rng.integers(0, 255, (b, img, img, 3)).astype(
            np.float32)
        batch[f"{c}_point_cloud"] = rng.uniform(
            -0.3, 1.2, (b, img, img, 3)).astype(np.float32)
    return batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--flash-ab-only", action="store_true",
                    help="run only the full vs full_flashtrain paired A/B")
    ap.add_argument("--bwd-split", action="store_true",
                    help="attribute the backward's 3:1 cost over the forward "
                         "(VERDICT r4 #6): time the vjp application ALONE "
                         "(residuals precomputed) at transformer depths "
                         "6/3/1 — the depth slope is the attention+mlp trunk "
                         "bwd per layer; the depth->0 extrapolation is the "
                         "conv front/decoder bwd floor")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from voxactb_tpu.agents.qfunction import (
        build_encoder, make_optimizer, make_train_step, normalize_rgb)
    from voxactb_tpu.config import MethodConfig
    from voxactb_tpu.ops.augmentation import Se3AugConfig, apply_se3_augmentation
    from voxactb_tpu.ops.voxelize import voxelize

    cameras = ["wrist", "wrist2"]
    base = dict(voxel_sizes=[50], which_arm="dominant", arm_pred_loss=True,
                crop_target_obj_voxel=True, crop_radius=0.3,
                compute_dtype="bfloat16")

    def timed(name, fn, *inputs, reps=5, per=1):
        # every profiled fn returns a SCALAR probe; fetch it to host inside the
        # timed region — on the axon relay block_until_ready returns before
        # execution completes, so a non-fetching timer measures only dispatch
        cfn = jax.jit(fn)
        t0 = time.time()
        out = np.asarray(jax.tree_util.tree_leaves(cfn(*inputs))[-1])
        compile_s = time.time() - t0
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = np.asarray(jax.tree_util.tree_leaves(cfn(*inputs))[-1])
            walls.append(time.perf_counter() - t0)
        assert np.isfinite(out).all(), (name, out)
        ms = sorted(walls)[len(walls) // 2] / per * 1e3
        print(json.dumps({"stage": name, "per_step_ms": round(ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
        return ms, out

    results = {}

    if args.bwd_split:
        import optax

        from voxactb_tpu.agents.qfunction import build_encoder

        for depth in (6, 3, 1):
            cfg = MethodConfig(**base, transformer_depth=depth)
            model = build_encoder(cfg)
            batch = {k: jnp.asarray(v)
                     for k, v in make_batch(cfg, cameras, args.batch).items()}
            n = cfg.voxel_size

            def loss(p, k, model=model, batch=batch, n=n):
                pcds = [batch[f"{c}_point_cloud"] for c in cameras]
                rgbs = [normalize_rgb(batch[f"{c}_rgb"]) for c in cameras]
                b = pcds[0].shape[0]
                bounds = batch["target_object_scene_bounds"]
                coords = jnp.concatenate(
                    [pc.reshape(b, -1, 3) for pc in pcds], 1)
                feats = jnp.concatenate([r.reshape(b, -1, 3) for r in rgbs], 1)
                grid = voxelize(coords, feats, bounds, voxel_size=n)
                out = model.apply(p, grid, batch["low_dim_state"],
                                  batch["lang_goal_emb"],
                                  batch["lang_token_embs"],
                                  train=True, rngs={"dropout": k})
                flat = out["trans"].reshape(b, -1).astype(jnp.float32)
                lab = batch["trans_action_indicies"].astype(jnp.int32)
                flat_label = (lab[:, 0] * n + lab[:, 1]) * n + lab[:, 2]
                return jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        flat, flat_label))

            params = jax.jit(model.init)(
                jax.random.key(0),
                jnp.zeros((args.batch, n, n, n, 10), jnp.float32),
                batch["low_dim_state"], batch["lang_goal_emb"],
                batch["lang_token_embs"])

            def fwd_d(params, key, loss=loss):
                def one(_, k):
                    return 0, loss(params, k)
                keys = jax.random.split(key, args.steps)
                return jax.lax.scan(one, 0, keys)[1]

            def bwd_d(params, key, loss=loss):
                # residuals from ONE forward; the scan applies the vjp alone
                # with a varying cotangent so XLA cannot CSE the iterations
                _, vjp_fn = jax.vjp(lambda p: loss(p, jax.random.key(7)),
                                    params)

                def one(_, k):
                    cot = 1.0 + 0.0 * jax.random.uniform(k)
                    (g,) = vjp_fn(cot)
                    return 0, sum(jnp.sum(v.astype(jnp.float32))
                                  for v in jax.tree_util.tree_leaves(g))
                keys = jax.random.split(key, args.steps)
                return jax.lax.scan(one, 0, keys)[1]

            ms_f, _ = timed(f"fwd_depth{depth}", fwd_d, params,
                            jax.random.key(1), per=args.steps)
            ms_b, _ = timed(f"bwd_depth{depth}", bwd_d, params,
                            jax.random.key(2), per=args.steps)
            results[f"fwd_depth{depth}"] = round(ms_f, 2)
            # subtract the single forward amortized over the scan
            results[f"bwd_depth{depth}"] = round(ms_b - ms_f / args.steps, 2)

        d6, d3, d1 = (results["bwd_depth6"], results["bwd_depth3"],
                      results["bwd_depth1"])
        per_layer = (d6 - d1) / 5.0
        results["bwd_attn_mlp_per_layer_ms"] = round(per_layer, 2)
        results["bwd_trunk6_ms"] = round(per_layer * 6, 2)
        results["bwd_conv_front_decoder_ms"] = round(d1 - per_layer, 2)
        results["bwd_fwd_ratio_depth6"] = round(d6 / max(
            results["fwd_depth6"], 1e-9), 2)
        print(json.dumps({"bwd_split": results}))
        return

    def chained_step(step_fn, n_steps):
        def chained(state, batch, key):
            def one(carry, k):
                st, _ = carry
                st, metrics = step_fn(st, batch, k)
                return (st, metrics["total_loss"]), None
            keys = jax.random.split(key, n_steps)
            (state, loss), _ = jax.lax.scan(one, (state, 0.0), keys)
            # pin the final state cheaply (first element of every param leaf)
            # so fetching the scalar can't let XLA drop the last update; LAMB's
            # per-leaf trust-ratio norms block slice-propagation of the rest
            probe = sum(x.ravel()[0].astype(jnp.float32)
                        for x in jax.tree_util.tree_leaves(state.params))
            return loss + 0.0 * probe
        return chained

    # -- full step under flag A/Bs ------------------------------------------
    state0 = None
    ab_rows = [
        ("full", {}),
        ("full_remat", {"remat": True}),
        ("full_noaug", {"apply_se3": False}),
        # custom-VJP flash attention: the [B,H,Tq,Tk] probabilities never
        # reach HBM in fwd or bwd (ops/pallas/flash_attention.py)
        ("full_flashtrain", {"pallas_attention_train": True}),
    ]
    if args.flash_ab_only:
        # paired A/B for the flash-train kernel alone: the remat/noaug rows
        # were measured in round 4 and cost ~4 min of relay compile each
        ab_rows = [ab_rows[0], ab_rows[3]]
    for name, flags in ab_rows:
        cfg = MethodConfig(**{**base, **flags,
                              "apply_se3": flags.get("apply_se3", True)})
        optimizer = make_optimizer(cfg, training_iterations=100_000)
        _, init_fn, step_fn = make_train_step(cfg, optimizer, cameras)
        batch = {k: jnp.asarray(v)
                 for k, v in make_batch(cfg, cameras, args.batch).items()}
        state = jax.jit(init_fn)(jax.random.key(0), batch)
        if state0 is None:
            state0 = state
        ms, _ = timed(name, chained_step(step_fn, args.steps), state, batch,
                      jax.random.key(1), per=args.steps)
        results[name] = round(ms, 2)

    # -- components ---------------------------------------------------------
    cfg = MethodConfig(**base, apply_se3=True)
    optimizer = make_optimizer(cfg, training_iterations=100_000)
    model, init_fn, _ = make_train_step(cfg, optimizer, cameras)
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(cfg, cameras, args.batch).items()}
    state = jax.jit(init_fn)(jax.random.key(0), batch)
    n = cfg.voxel_size
    aug_cfg = Se3AugConfig(trans_range=tuple(cfg.aug_xyz),
                           rot_range_deg=tuple(cfg.aug_rpy),
                           rot_resolution_deg=cfg.aug_rot_resolution)

    def vox_aug(batch, key):
        def one(_, k):
            pcds = [batch[f"{c}_point_cloud"] for c in cameras]
            rgbs = [normalize_rgb(batch[f"{c}_rgb"]) for c in cameras]
            b = pcds[0].shape[0]
            bounds = batch["target_object_scene_bounds"]
            rg = batch["rot_grip_action_indicies"].astype(jnp.int32)
            aug = apply_se3_augmentation(
                k, pcds, batch["gripper_pose"], rg, bounds,
                voxel_size=n, rot_resolution_deg=cfg.rotation_resolution,
                cfg=aug_cfg)
            coords = jnp.concatenate(
                [p.reshape(b, -1, 3) for p in aug.pcds], 1)
            feats = jnp.concatenate([r.reshape(b, -1, 3) for r in rgbs], 1)
            grid = voxelize(coords, feats, bounds, voxel_size=n)
            return 0, jnp.sum(grid.astype(jnp.float32))
        keys = jax.random.split(key, args.steps)
        return jax.lax.scan(one, 0, keys)[1]

    ms, _ = timed("vox_aug_only", vox_aug, batch, jax.random.key(1),
                  per=args.steps)
    results["vox_aug_only"] = round(ms, 2)

    def fwd_only(params, batch, key):
        def one(_, k):
            pcds = [batch[f"{c}_point_cloud"] for c in cameras]
            rgbs = [normalize_rgb(batch[f"{c}_rgb"]) for c in cameras]
            b = pcds[0].shape[0]
            bounds = batch["target_object_scene_bounds"]
            coords = jnp.concatenate([p.reshape(b, -1, 3) for p in pcds], 1)
            feats = jnp.concatenate([r.reshape(b, -1, 3) for r in rgbs], 1)
            grid = voxelize(coords, feats, bounds, voxel_size=n)
            out = model.apply(params, grid, batch["low_dim_state"],
                              batch["lang_goal_emb"], batch["lang_token_embs"],
                              train=True, rngs={"dropout": k})
            return 0, sum(jnp.sum(v.astype(jnp.float32))
                          for v in jax.tree_util.tree_leaves(out))
        keys = jax.random.split(key, args.steps)
        return jax.lax.scan(one, 0, keys)[1]

    ms, _ = timed("fwd_only", fwd_only, state.params, batch, jax.random.key(1),
                  per=args.steps)
    results["fwd_only"] = round(ms, 2)

    def grad_only(params, batch, key):
        def loss(p, k):
            pcds = [batch[f"{c}_point_cloud"] for c in cameras]
            rgbs = [normalize_rgb(batch[f"{c}_rgb"]) for c in cameras]
            b = pcds[0].shape[0]
            bounds = batch["target_object_scene_bounds"]
            coords = jnp.concatenate([pc.reshape(b, -1, 3) for pc in pcds], 1)
            feats = jnp.concatenate([r.reshape(b, -1, 3) for r in rgbs], 1)
            grid = voxelize(coords, feats, bounds, voxel_size=n)
            out = model.apply(p, grid, batch["low_dim_state"],
                              batch["lang_goal_emb"], batch["lang_token_embs"],
                              train=True, rngs={"dropout": k})
            flat = out["trans"].reshape(b, -1).astype(jnp.float32)
            lab = batch["trans_action_indicies"].astype(jnp.int32)
            flat_label = (lab[:, 0] * n + lab[:, 1]) * n + lab[:, 2]
            import optax
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                flat, flat_label))

        def one(_, k):
            _, g = jax.value_and_grad(loss)(params, k)
            return 0, sum(jnp.sum(v.astype(jnp.float32))
                          for v in jax.tree_util.tree_leaves(g))
        keys = jax.random.split(key, args.steps)
        return jax.lax.scan(one, 0, keys)[1]

    ms, _ = timed("grad_only", grad_only, state.params, batch,
                  jax.random.key(1), per=args.steps)
    results["grad_only"] = round(ms, 2)

    def opt_only(state, key):
        def one(carry, k):
            st = carry
            # grads stand-in: params themselves (same pytree/shapes/dtypes)
            updates, opt_state = optimizer.update(
                st.params, st.opt_state, st.params)
            import optax
            params = optax.apply_updates(st.params, updates)
            st = st.replace(params=params, opt_state=opt_state,
                            step=st.step + 1)
            return st, None
        keys = jax.random.split(key, args.steps)
        st, _ = jax.lax.scan(one, state, keys)
        # pin params + opt_state: returning only st.step lets XLA dead-code
        # the whole LAMB update out of the scan (measured: 0.02 ms vs the real
        # cost) — same probe trick as chained_step above
        probe = sum(x.ravel()[0].astype(jnp.float32)
                    for x in jax.tree_util.tree_leaves((st.params,
                                                        st.opt_state)))
        return st.step.astype(jnp.float32) + 0.0 * probe
    ms, _ = timed("opt_only", opt_only, state0, jax.random.key(1),
                  per=args.steps)
    results["opt_only"] = round(ms, 2)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
