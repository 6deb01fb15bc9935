"""Functional Q-attention core: fused inference and training programs.

The reference splits this across ``QFunction`` (voxelize + forward,
qattention_peract_bc_agent.py:31-135), ``QAttentionPerActBCAgent.update`` (:418-641,
host-side one-hot loops + backward) and ``.act`` (:643-787, softmax/argmax + coordinate
decode with several device<->host hops). Here each direction is ONE jitted device
program with static shapes:

- ``make_infer_fn``:  rgb(uint8-ish) + pcd + proprio + lang + bounds
                      -> voxelize -> Perceiver -> argmax decode -> continuous action.
                      No host round-trips; rgb normalization ((x/255)*2-1,
                      preprocess_agent.py:21) is fused in.
- ``make_train_step``: replay batch -> (bounds select | crop jitter) -> SE(3) aug ->
                      voxelize -> forward(dropout) -> vectorized CE losses -> LAMB/Adam
                      update. Gradient all-reduce comes from jit-over-Mesh sharding,
                      not an explicit backend (SURVEY §2.7).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from voxactb_tpu.config import MethodConfig
from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder
from voxactb_tpu.ops import geometry as G
from voxactb_tpu.ops.augmentation import Se3AugConfig, apply_se3_augmentation
from voxactb_tpu.ops.voxelize import flatten_camera_observations, voxelize


def build_encoder(cfg: MethodConfig, low_dim_size: Optional[int] = None
                  ) -> PerceiverVoxelLangEncoder:
    """Instantiate the Q-net from a method config (create_agent, launch_utils.py:663+)."""
    if cfg.voxel_size % cfg.voxel_patch_stride != 0:
        raise ValueError(
            f"voxel_size {cfg.voxel_size} must be divisible by voxel_patch_stride "
            f"{cfg.voxel_patch_stride} (the decoder upsamples the patch grid back "
            "to the full resolution for the skip connection)")
    two_heads = cfg.variant == "one_policy_more_heads"
    return PerceiverVoxelLangEncoder(
        depth=cfg.transformer_depth,
        iterations=cfg.transformer_iterations,
        voxel_size=cfg.voxel_size,
        initial_dim=10,
        low_dim_size=low_dim_size if low_dim_size is not None else cfg.low_dim_size(),
        num_rotation_classes=cfg.num_rotation_classes,
        num_latents=cfg.num_latents,
        latent_dim=cfg.latent_dim,
        cross_heads=cfg.cross_heads,
        latent_heads=cfg.latent_heads,
        cross_dim_head=cfg.cross_dim_head,
        latent_dim_head=cfg.latent_dim_head,
        activation=cfg.activation,
        input_dropout=cfg.input_dropout,
        attn_dropout=cfg.attn_dropout,
        decoder_dropout=cfg.decoder_dropout,
        voxel_patch_size=cfg.voxel_patch_size,
        voxel_patch_stride=cfg.voxel_patch_stride,
        final_dim=cfg.final_dim,
        no_skip_connection=cfg.no_skip_connection,
        no_perceiver=cfg.no_perceiver,
        no_language=cfg.no_language,
        arm_pred=cfg.arm_pred_loss and not two_heads,
        num_proprio=2 if two_heads else 1,
        two_arm_heads=two_heads,
        fused_upsample=cfg.fused_upsample,
        pallas_stats=cfg.pallas_stats,
        zshift_conv3d=cfg.zshift_conv3d,
        pallas_decoder=cfg.pallas_decoder,
        pallas_decoder_v3=cfg.pallas_decoder_v3,
        pallas_decoder_v2c=cfg.pallas_decoder_v2c,
        pallas_encoder=cfg.pallas_encoder,
        pallas_attention=cfg.pallas_attention,
        pallas_attention_train=cfg.pallas_attention_train,
        pallas_interpret=cfg.pallas_interpret,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
    )


def normalize_rgb(x: jax.Array) -> jax.Array:
    """[0,255] -> [-1,1] (preprocess_agent.py:21)."""
    return (x.astype(jnp.float32) / 255.0) * 2.0 - 1.0


def front_eligible(cfg: MethodConfig) -> bool:
    """Whether the fully fused front kernel applies to this config."""
    return (cfg.pallas_front and cfg.compute_dtype == "bfloat16"
            and cfg.activation == "lrelu" and cfg.voxel_patch_size == 5
            and cfg.voxel_patch_stride == 5 and cfg.voxel_size % 5 == 0)


def fused_front_inputs(cfg: MethodConfig, params, coords, feats, bounds):
    """Run the fused front kernel (ops/pallas/front_fused.py) with the model's own
    preprocess/patchify weights; returns the ``front`` tuple for
    ``PerceiverVoxelLangEncoder.__call__`` — (d0, patch_tokens, kp0, gmax0) —
    plus the kernel's per-sample row_cap overflow count ([B] int32, 0 unless a
    pathologically clustered cloud dropped points the XLA scatter would keep,
    voxel_grid.py:106-127)."""
    from voxactb_tpu.ops.pallas.front_fused import front_fused

    p = params["params"]
    w1 = p["input_preprocess"]["kernel"][0, 0, 0]
    b1 = p["input_preprocess"]["bias"]
    wp = p["patchify"]["kernel"]
    bp = p["patchify"]["bias"]
    d0, patch_pre, kp, gmax, overflow = front_fused(
        coords, feats, bounds, w1, b1, wp, voxel_size=cfg.voxel_size,
        interpret=cfg.pallas_interpret,
        scatter_unroll=cfg.front_scatter_unroll,
        scatter_matmul=cfg.front_scatter_matmul)
    # bias + lrelu on the tiny patch grid, in Conv3D's f32-accumulate order
    ins = jax.nn.leaky_relu(
        (patch_pre + bp).astype(jnp.bfloat16), 0.02)
    return (d0, ins, kp, gmax), overflow


def apply_with_front(cfg: MethodConfig, model, params, coords, feats, bounds,
                     proprio, lang_goal_emb, lang_token_embs):
    """Q-forward dispatch shared by the agent and every bench/probe program.

    With the fused front the dense voxel grid is never materialized and the
    returned ``grid`` is a [B,1,1,1,10] placeholder (it only feeds
    visualization — use ``pallas_front=False`` when rendering voxel grids);
    otherwise the XLA voxelize path materializes and returns the real grid.
    Returns ``(out, grid)``.
    """
    b = coords.shape[0]
    if front_eligible(cfg):
        front, overflow = fused_front_inputs(cfg, params, coords, feats, bounds)
        grid = jnp.zeros((b, 1, 1, 1, 10), jnp.float32)
        out = model.apply(params, grid, proprio, lang_goal_emb,
                          lang_token_embs, front=front)
    else:
        grid = voxelize(coords, feats, bounds, voxel_size=cfg.voxel_size)
        out = model.apply(params, grid, proprio, lang_goal_emb,
                          lang_token_embs)
        overflow = jnp.zeros((b,), jnp.int32)  # XLA scatter keeps all points
    return out, grid, overflow


def _flat_argmax_3d(q_trans: jax.Array) -> jax.Array:
    """[B,N,N,N,1] -> [B,3] int32 argmax voxel index (QFunction._argmax_3d :57-63)."""
    b = q_trans.shape[0]
    n = q_trans.shape[1]
    flat = q_trans.reshape(b, -1)
    idx = jnp.argmax(flat, axis=-1).astype(jnp.int32)
    return jnp.stack([idx // (n * n), (idx // n) % n, idx % n], axis=-1)


def _decode_rot_grip(rot_grip_logits: jax.Array, num_rot: int) -> jax.Array:
    """[B, 3R+2] -> [B,4] int32 (rx, ry, rz bins + grip bit) (:65-78)."""
    rx = jnp.argmax(rot_grip_logits[:, 0 * num_rot:1 * num_rot], -1)
    ry = jnp.argmax(rot_grip_logits[:, 1 * num_rot:2 * num_rot], -1)
    rz = jnp.argmax(rot_grip_logits[:, 2 * num_rot:3 * num_rot], -1)
    grip = jnp.argmax(rot_grip_logits[:, 3 * num_rot:], -1)
    return jnp.stack([rx, ry, rz, grip], axis=-1).astype(jnp.int32)


class InferOutput(NamedTuple):
    """Everything act() needs, produced on device in one program."""

    trans_idx: jax.Array             # [B, 3] int32 voxel index
    rot_grip_idx: jax.Array          # [B, 4] int32
    collision_idx: jax.Array         # [B, 1] int32
    attention_coordinate: jax.Array  # [B, 3] float32 world point
    continuous_action: jax.Array     # [B, 9] = xyz + quat(xyzw) + grip + collision
    q_trans: jax.Array               # [B, N, N, N] softmaxed Q for viz/summaries
    voxel_grid: jax.Array            # [B, N, N, N, 10]
    front_overflow: jax.Array        # [B] int32: points the fused front kernel
    #                                  dropped past row_cap (0 on the XLA path)


def make_infer_fn(cfg: MethodConfig, low_dim_size: Optional[int] = None):
    """Build the fused act-time program. Returned fn is jitted; weights are arg 0.

    For the 'one_policy_more_heads' variant the returned InferOutput gains a leading
    head axis of size 2 (right, left) on every action field.
    """
    model = build_encoder(cfg, low_dim_size)
    n = cfg.voxel_size
    num_rot = cfg.num_rotation_classes
    two_heads = cfg.variant == "one_policy_more_heads"

    @jax.jit
    def infer(params, rgbs: Tuple[jax.Array, ...], pcds: Tuple[jax.Array, ...],
              proprio, lang_goal_emb, lang_token_embs, bounds) -> InferOutput:
        b = pcds[0].shape[0]
        bounds = jnp.broadcast_to(jnp.asarray(bounds, jnp.float32), (b, 6))
        coords, feats = flatten_camera_observations(
            [normalize_rgb(r) for r in rgbs], pcds)
        out, grid, overflow = apply_with_front(
            cfg, model, params, coords, feats, bounds,
            proprio, lang_goal_emb, lang_token_embs)

        def decode(trans, rot_grip, collision):
            t_idx = _flat_argmax_3d(trans)
            rg_idx = _decode_rot_grip(rot_grip, num_rot)
            c_idx = jnp.argmax(collision, -1, keepdims=True).astype(jnp.int32)
            att = G.attention_coordinate(t_idx, n, bounds)
            quat = G.discrete_euler_to_quaternion(
                rg_idx[:, :3], cfg.rotation_resolution
            )
            cont = jnp.concatenate(
                [att, quat, rg_idx[:, 3:4].astype(jnp.float32),
                 c_idx.astype(jnp.float32)], -1,
            )
            q_soft = jax.nn.softmax(trans.reshape(b, -1), -1).reshape(b, n, n, n)
            return t_idx, rg_idx, c_idx, att, cont, q_soft

        if two_heads:
            parts = [
                decode(out[f"trans_{s}"], out[f"rot_grip_{s}"], out[f"collision_{s}"])
                for s in ("right", "left")
            ]
            stacked = [jnp.stack(field) for field in zip(*parts)]
            return InferOutput(*stacked, voxel_grid=grid,
                               front_overflow=overflow)

        return InferOutput(*decode(out["trans"], out["rot_grip"], out["collision"]),
                           voxel_grid=grid, front_overflow=overflow)

    return model, infer


# ---------------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------------


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def cosine_hard_restarts_schedule(base_lr: float, warmup_steps: int,
                                  total_steps: int, num_cycles: int):
    """transformers.get_cosine_with_hard_restarts_schedule_with_warmup equivalent
    (qattention_peract_bc_agent.py:274-279: cycles = iterations // 10000)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        cycle_pos = (num_cycles * progress) % 1.0
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycle_pos)))
        cos = jnp.where(progress >= 1.0, 0.0, cos)
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def make_optimizer(cfg: MethodConfig, training_iterations: int = 1_000_000):
    """LAMB (default) or Adam with the reference hyperparameters
    (qattention_peract_bc_agent.py:255-268; PERACT_BC.yaml:30-35)."""
    lr = (
        cosine_hard_restarts_schedule(
            cfg.lr, cfg.num_warmup_steps, training_iterations,
            max(1, training_iterations // 10_000),
        )
        if cfg.lr_scheduler
        else cfg.lr
    )
    if cfg.optimizer == "lamb":
        return optax.lamb(lr, b1=0.9, b2=0.999, weight_decay=cfg.lambda_weight_l2)
    if cfg.optimizer == "adam":
        # torch.optim.Adam(weight_decay=..) couples the L2 term THROUGH the
        # adaptive moments (g + wd*p before scale_by_adam) — adamw's decoupled
        # decay is a different update rule
        return optax.chain(
            optax.add_decayed_weights(cfg.lambda_weight_l2),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(lr),
        )
    raise ValueError(f"Unknown optimizer type {cfg.optimizer!r}")


def _ce(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-sample cross entropy with integer labels — the vectorized replacement for
    the reference's one-hot python loops (qattention_peract_bc_agent.py:518-570)."""
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    )


def make_train_step(cfg: MethodConfig, optimizer, camera_names: Sequence[str],
                    low_dim_size: Optional[int] = None):
    """Build the fused BC train step. Returns (model, init_fn, step_fn).

    ``step_fn(state, batch, rng) -> (state, metrics)`` where ``batch`` carries the
    replay signature (launch_utils.py:37-166): per-camera ``{cam}_rgb`` (uint8 scale)
    and ``{cam}_point_cloud``, ``trans_action_indicies``, ``rot_grip_action_indicies``,
    ``ignore_collisions``, ``gripper_pose``, ``lang_goal_emb``, ``lang_token_embs``,
    ``low_dim_state``, optional ``target_object_scene_bounds`` / ``label`` and the
    ``*_left`` twins for the one_policy_more_heads variant.
    """
    model = build_encoder(cfg, low_dim_size)
    n = cfg.voxel_size
    num_rot = cfg.num_rotation_classes
    two_heads = cfg.variant == "one_policy_more_heads"
    aug_cfg = Se3AugConfig(
        trans_range=tuple(cfg.aug_xyz),
        rot_range_deg=tuple(cfg.aug_rpy),
        rot_resolution_deg=cfg.aug_rot_resolution,
    )

    def loss_fn(params, batch, bounds, rng):
        rng_aug, rng_drop = jax.random.split(rng)
        pcds = [batch[f"{c}_point_cloud"] for c in camera_names]
        rgbs = [normalize_rgb(batch[f"{c}_rgb"]) for c in camera_names]
        b = pcds[0].shape[0]

        trans_labels = batch["trans_action_indicies"][:, :3].astype(jnp.int32)
        rot_grip_labels = batch["rot_grip_action_indicies"].astype(jnp.int32)
        if two_heads:
            trans_labels_l = batch["trans_action_indicies_left"][:, :3].astype(jnp.int32)
            rot_grip_labels_l = batch["rot_grip_action_indicies_left"].astype(jnp.int32)

        if cfg.apply_se3:
            aug = apply_se3_augmentation(
                rng_aug, pcds, batch["gripper_pose"], rot_grip_labels, bounds,
                voxel_size=n, rot_resolution_deg=cfg.rotation_resolution,
                cfg=aug_cfg,
                action_gripper_pose_left=batch.get("gripper_pose_left")
                if two_heads else None,
                action_rot_grip_left=rot_grip_labels_l if two_heads else None,
            )
            pcds = list(aug.pcds)
            trans_labels, rot_grip_labels = aug.trans_indices, aug.rot_grip_indices
            if two_heads:
                trans_labels_l = aug.trans_indices_left
                rot_grip_labels_l = aug.rot_grip_indices_left

        coords, feats = flatten_camera_observations(rgbs, pcds)
        grid = voxelize(coords, feats, bounds, voxel_size=n)

        def apply(p, g, low_dim, lang_emb, lang_toks, key):
            # train/rngs are bound inside so jax.checkpoint sees only array
            # args (a traced `train=` kwarg breaks the module's bool checks)
            return model.apply(p, g, low_dim, lang_emb, lang_toks,
                               train=True, rngs={"dropout": key})

        if cfg.remat:
            apply = jax.checkpoint(apply)
        out = apply(
            params, grid, batch["low_dim_state"], batch["lang_goal_emb"],
            batch["lang_token_embs"], rng_drop,
        )

        collision_labels = batch["ignore_collisions"][:, 0].astype(jnp.int32)

        def head_losses(trans, rot_grip, collision, t_lab, rg_lab):
            flat_label = (t_lab[:, 0] * n + t_lab[:, 1]) * n + t_lab[:, 2]
            l_trans = _ce(trans.reshape(b, -1), flat_label)
            l_rot = sum(
                _ce(rot_grip[:, i * num_rot:(i + 1) * num_rot], rg_lab[:, i])
                for i in range(3)
            )
            l_grip = _ce(rot_grip[:, 3 * num_rot:], rg_lab[:, 3])
            l_coll = _ce(collision, collision_labels)
            return l_trans, l_rot, l_grip, l_coll

        metrics = {}
        if two_heads:
            lt_r, lr_r, lg_r, lc_r = head_losses(
                out["trans_right"], out["rot_grip_right"], out["collision_right"],
                trans_labels, rot_grip_labels,
            )
            lt_l, lr_l, lg_l, lc_l = head_losses(
                out["trans_left"], out["rot_grip_left"], out["collision_left"],
                trans_labels_l, rot_grip_labels_l,
            )
            l_trans, l_rot = lt_r + lt_l, lr_r + lr_l
            l_grip, l_coll = lg_r + lg_l, lc_r + lc_l
            l_arm = 0.0
        else:
            l_trans, l_rot, l_grip, l_coll = head_losses(
                out["trans"], out["rot_grip"], out["collision"],
                trans_labels, rot_grip_labels,
            )
            l_arm = 0.0
            if cfg.arm_pred_loss:
                arm_labels = batch["label"].reshape(b).astype(jnp.int32)
                l_arm = _ce(out["arm"], arm_labels)
                metrics["arm_loss"] = jnp.mean(l_arm)

        total = jnp.mean(
            l_trans * cfg.trans_loss_weight
            + l_rot * cfg.rot_loss_weight
            + l_grip * cfg.grip_loss_weight
            + l_coll * cfg.collision_loss_weight
            + l_arm * cfg.arm_loss_weight
        )
        metrics.update(
            total_loss=total,
            trans_loss=jnp.mean(l_trans),
            rot_loss=jnp.mean(l_rot),
            grip_loss=jnp.mean(l_grip),
            collision_loss=jnp.mean(l_coll),
        )
        return total, metrics

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng):
        b = batch["trans_action_indicies"].shape[0]
        rng = jax.random.fold_in(rng, state.step)
        rng_bounds, rng_loss = jax.random.split(rng)

        # bounds: per-sample VLM-crop bounds override the static scene bounds
        # (qattention update :431-451), with optional +/-5cm crop-point jitter.
        if cfg.crop_target_obj_voxel:
            bounds = batch["target_object_scene_bounds"].astype(jnp.float32)
            if cfg.randomizations_crop_point:
                shift = jax.random.uniform(
                    rng_bounds, (b, 3), minval=-0.05, maxval=0.05
                )
                bounds = bounds + jnp.tile(shift, (1, 2))
        else:
            bounds = jnp.broadcast_to(batch["scene_bounds"], (b, 6)).astype(jnp.float32)

        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, bounds, rng_loss
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        return TrainState(state.step + 1, params, opt_state), metrics

    def init_fn(rng, example_batch) -> TrainState:
        pcd = example_batch[f"{camera_names[0]}_point_cloud"]
        b = pcd.shape[0]
        params = model.init(
            rng,
            jnp.zeros((b, n, n, n, 10)),
            example_batch["low_dim_state"],
            example_batch["lang_goal_emb"],
            example_batch["lang_token_embs"],
        )
        return TrainState(jnp.zeros((), jnp.int32), params, optimizer.init(params))

    return model, init_fn, train_step
