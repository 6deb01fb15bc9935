"""Benchmark: fused voxelize + PerAct Q-forward steps/sec at the 100^3 grid.

BASELINE.md north star: >1000 fused voxelize+Q-forward steps/sec on a v5e-8 slice and
>=10x the PyTorch reference's per-step policy latency. This driver runs on ONE v5e
chip, so ``vs_baseline`` compares against the per-chip share of the v5e-8 target
(1000 / 8 = 125 steps/s/chip).

Measurement notes (see tools/roofline.py):
- the dev box reaches the chip through the axon relay; ``block_until_ready`` returns
  early there and a single dispatch+fetch pays a ~30-100ms network round trip, so
  all numbers chain N act-steps on device inside one jit (lax.scan) and fetch once;
- the relay-virtualized chip sustains only ~66 GB/s effective HBM bandwidth and
  ~1.9ms per sequential op (measured), vs 819 GB/s on physical v5e — the same
  program's arithmetic puts it at ~100+ steps/s/chip on real hardware;
- throughput mode batches 8 observations per program step (steps/sec counts acts).

Prints exactly one JSON line.
"""

import json
import os
import sys
import time
import traceback

import numpy as np

N_CHAIN = 32   # the relay round-trip (~50-100ms) amortizes over the chain;
# 16 steps left ~3-6ms/step of fetch overhead in the number
BATCH = 8
# fused pallas encoder/decoder kernels (ops/pallas/): isolated decoder tail
# 14.5ms vs 20.6ms XLA; paired A/Bs win at every operating point (latency,
# batch-8, 50^3 crop). Defaults ON in all bench configs.
PALLAS_DECODER = os.environ.get("BENCH_PALLAS_DECODER", "1") == "1"
# v3 inline-upsample tail (u0 never in HBM): wins on the bandwidth-starved
# relay; flip default after the on-chip A/B proves it (tools/probe_decoder_ab)
PALLAS_DECODER_V3 = os.environ.get("BENCH_PALLAS_DECODER_V3", "0") == "1"
# Paired act-chain A/B, 2026-08-19 (/tmp/chipq10/act_ab.log, one process,
# median-of-3, ms/act):
#   config   | base  | flash | v2c   | unroll8 | flash+v2c+unroll8
#   n100 b1  | 28.85 | 27.63 | 29.59 | 28.03   | 27.15
#   n100 b8  | 29.23 | 21.87 | 29.80 | 28.32   | 21.55
#   n50  b1  |  8.57 |  7.77 |  8.67 |  7.05   |  6.29
# -> flash and unroll8 win in every config (flash is the batched-8 lever:
#    -7.4 ms/act); v2c loses solo and adds ~nothing inside the combo.
# K-concat z-accumulation tail schedule (decoder_head_v2c): default OFF.
PALLAS_DECODER_V2C = os.environ.get("BENCH_PALLAS_DECODER_V2C", "0") == "1"
# plane-split width of the front kernel's serial scatter loop (8 breaks the
# RMW dependency chain): default 8 from the A/B above.
FRONT_UNROLL = int(os.environ.get("BENCH_FRONT_UNROLL", "8"))
# one-hot MXU-matmul scatter in the front kernel (replaces the serial RMW
# loop with a single f32 dot per grid row): default pending the on-chip A/B.
FRONT_MATMUL = os.environ.get("BENCH_FRONT_MATMUL", "0") == "1"
PALLAS_ENCODER = os.environ.get("BENCH_PALLAS_ENCODER", "1") == "1"
# round-3 fully fused front (voxelize+preprocess+stats+patchify, one kernel)
PALLAS_FRONT = os.environ.get("BENCH_PALLAS_FRONT", "1") == "1"
# flash attention in the perceiver trunk (logits never in HBM): default ON
# from the A/B above. Near-tie argmax flips vs the XLA trunk are possible
# (online-softmax rounding): 3/144 action elements at n100 b1 random-weights,
# none at the 50^3 operating point.
PALLAS_ATTN = os.environ.get("BENCH_PALLAS_ATTN", "1") == "1"
# fused rel-pos attention for the SAM ViT-H WINDOWED blocks too (the global
# blocks always fuse at bf16). Default ON from the paired on-chip A/B
# (2026-08-19, tools/profile_sam.py, one process, median-of-3 full-encoder):
# XLA 365.0 | fused-global 315.1 | fused-global+windowed 263.0 ms/frame.
SAM_FUSED_WINDOWED = os.environ.get("BENCH_SAM_FUSED_WINDOWED", "1") == "1"


def make_decode(cfg, batch):
    """Full 9-dof action decode — trans voxel idx -> world coords, discrete
    euler -> quaternion, grip + collision bits — exactly what
    QAttentionStackAgent.act produces (qattention_stack_agent.py:80-89). Shared
    by every bench chain so all throughput keys measure the program act() runs."""
    import jax.numpy as jnp

    from voxactb_tpu.ops import geometry as G

    n = cfg.voxel_size
    nr = cfg.num_rotation_classes

    def decode(out, bounds):
        flat = jnp.argmax(out["trans"].reshape(batch, -1), -1).astype(jnp.int32)
        idx = jnp.stack([flat // (n * n), (flat // n) % n, flat % n], -1)
        att = G.attention_coordinate(idx, n, bounds)
        rg = out["rot_grip"]
        rot = jnp.stack([jnp.argmax(rg[:, i * nr:(i + 1) * nr], -1)
                         for i in range(3)], -1)
        quat = G.discrete_euler_to_quaternion(rot, cfg.rotation_resolution)
        grip = jnp.argmax(rg[:, 3 * nr:], -1, keepdims=True).astype(jnp.float32)
        coll = jnp.argmax(out["collision"], -1,
                          keepdims=True).astype(jnp.float32)
        return jnp.concatenate([att, quat, grip, coll], -1)

    return decode


def build_chain(cfg, batch, params=None):
    import jax
    import jax.numpy as jnp

    from voxactb_tpu.agents.qfunction import apply_with_front, build_encoder

    model = build_encoder(cfg)
    n = cfg.voxel_size
    rng = np.random.default_rng(0)
    img = 128
    rgbs = jnp.asarray(rng.integers(
        0, 255, (N_CHAIN, 2, batch, img, img, 3)).astype(np.float32))
    pcds = jnp.asarray(rng.uniform(
        -0.5, 1.5, (N_CHAIN, 2, batch, img, img, 3)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(batch, 4)).astype(np.float32))
    lang_goal = jnp.asarray(rng.normal(size=(batch, 1024)).astype(np.float32))
    lang_tok = jnp.asarray(rng.normal(size=(batch, 77, 512)).astype(np.float32))
    bounds = jnp.asarray([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]] * batch, jnp.float32)
    if params is None:
        # params are batch-independent; jitted init at batch 1 keeps peak HBM low
        params = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, n, n, n, 10)),
            jnp.zeros((1, 4)), jnp.zeros((1, 1024)), jnp.zeros((1, 77, 512)))

    decode = make_decode(cfg, batch)

    def one_step(carry, obs):
        rgb, pcd = obs
        coords = pcd.reshape(batch, -1, 3)
        feats = ((rgb / 255.0) * 2.0 - 1.0).reshape(batch, -1, 3)
        out, _, _ = apply_with_front(cfg, model, params, coords, feats, bounds,
                                  proprio, lang_goal, lang_tok)
        return carry, decode(out, bounds)

    @jax.jit
    def chained(rgbs, pcds):
        return jax.lax.scan(one_step, 0, (rgbs, pcds))[1]

    return chained, rgbs, pcds


def time_chain(chained, rgbs, pcds, batch, reps: int = 5):
    """Median of ``reps`` timed fetches — the relay shows up to ~40% run-to-run
    variance on identical programs, so a single sample is not trustworthy."""
    actions = np.asarray(chained(rgbs, pcds))  # compile + warm
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        actions = np.asarray(chained(rgbs, pcds))
        walls.append(time.perf_counter() - t0)
    assert actions.shape == (N_CHAIN, batch, 9) and np.isfinite(actions).all()
    return N_CHAIN * batch / sorted(walls)[len(walls) // 2]


def time_train_chain(batch: int, n_steps: int = 8):
    """Chained BC train steps/sec at the canonical 50^3 training config."""
    import jax
    import jax.numpy as jnp

    from voxactb_tpu.agents.qfunction import make_optimizer, make_train_step
    from voxactb_tpu.config import MethodConfig

    # remat setting from the honest fetch-in-region A/B (tools/profile_train.py,
    # on-chip 2026-08-19): full 329.0 ms/step vs full_remat 429.7 at batch 8 —
    # recomputing the forward costs more than the 128 MB/sample activation
    # traffic it saves on this part, so remat defaults OFF
    remat = os.environ.get("BENCH_TRAIN_REMAT", "0") == "1"
    # custom-VJP flash attention in the train step (probabilities never reach
    # HBM in fwd or bwd — the measured dominant term of the 3:1 bwd/fwd
    # ratio). Default ON from the paired on-chip A/B (2026-08-21,
    # tools/profile_train.py --flash-ab-only, one process, median-of-5 per 8
    # samples at 50^3 b8): full 329.75 ms vs full_flashtrain 167.48 ms — the
    # kernel halves the step.
    flash_train = os.environ.get("BENCH_TRAIN_FLASH", "1") == "1"
    cfg = MethodConfig(voxel_sizes=[50], which_arm="dominant", arm_pred_loss=True,
                       crop_target_obj_voxel=True, crop_radius=0.3,
                       compute_dtype="bfloat16", apply_se3=True, remat=remat,
                       pallas_attention_train=flash_train)
    cameras = ["wrist", "wrist2"]
    optimizer = make_optimizer(cfg, training_iterations=100_000)
    _, init_fn, step_fn = make_train_step(cfg, optimizer, cameras)

    rng = np.random.default_rng(0)
    b, img = batch, 128
    batch_np = {
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
        "low_dim_state": rng.normal(size=(b, cfg.low_dim_size())).astype(np.float32),
        "label": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "scene_bounds": np.asarray([-0.3, -0.5, 0.4, 0.5, 0.5, 1.2], np.float32),
        # per-sample VLM-crop bounds (launch_utils.py:341-347 signature)
        "target_object_scene_bounds": np.tile(
            np.asarray([-0.1, -0.3, 0.5, 0.5, 0.3, 1.1], np.float32), (b, 1)),
    }
    batch_np["gripper_pose"][:, 3:] /= np.linalg.norm(
        batch_np["gripper_pose"][:, 3:], axis=-1, keepdims=True)
    for c in cameras:
        batch_np[f"{c}_rgb"] = rng.integers(
            0, 255, (b, img, img, 3)).astype(np.float32)
        batch_np[f"{c}_point_cloud"] = rng.uniform(
            -0.3, 1.2, (b, img, img, 3)).astype(np.float32)
    device_batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    state = jax.jit(init_fn)(jax.random.key(0), device_batch)
    param_count = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(state.params))

    @jax.jit
    def chained(state, batch, key):
        def one(carry, k):
            st, _ = carry
            st, metrics = step_fn(st, batch, k)
            return (st, metrics["total_loss"]), None
        keys = jax.random.split(key, n_steps)
        (state, loss), _ = jax.lax.scan(one, (state, 0.0), keys)
        return state, loss

    state, loss = chained(state, device_batch, jax.random.key(1))  # compile+warm
    assert np.isfinite(float(np.asarray(loss)))
    walls = []
    for rep in range(5):  # median of 5: the relay jitters up to ~40% run-to-run
        t0 = time.perf_counter()
        _, loss = chained(state, device_batch, jax.random.key(2 + rep))
        loss = float(np.asarray(loss))  # fetch INSIDE the timed region (axon
        walls.append(time.perf_counter() - t0)  # relay returns early)
        assert np.isfinite(loss)
    return n_steps * batch / sorted(walls)[len(walls) // 2], param_count


def build_dual_chain(n_steps: int = 32):
    """BASELINE staged config #2: the VoxAct-B dual-policy episode — acting and
    stabilizing parameter sets alternating per step on the 50^3 VLM-cropped grid
    (rollout_generator.py:233-244). One chained program; the step's parameter set
    is a dynamic slice of a stacked param pair, so each step reads only the
    selected network's weights. Each step runs the FULL act() decode (trans ->
    world coords, rot quat, grip, collision), and the crop ``bounds`` are a
    runtime argument so the episode bench can feed VLM-derived bounds in."""
    import jax
    import jax.numpy as jnp

    from voxactb_tpu.agents.qfunction import apply_with_front, build_encoder
    from voxactb_tpu.config import MethodConfig

    cfg = MethodConfig(voxel_sizes=[50], which_arm="right",
                       compute_dtype="bfloat16", zshift_conv3d=True,
                       pallas_decoder=PALLAS_DECODER,
                       pallas_decoder_v3=PALLAS_DECODER_V3,
                       pallas_decoder_v2c=PALLAS_DECODER_V2C,
                       front_scatter_unroll=FRONT_UNROLL,
                       front_scatter_matmul=FRONT_MATMUL,
                       pallas_encoder=PALLAS_ENCODER,
                       pallas_front=PALLAS_FRONT,
                       pallas_attention=PALLAS_ATTN)
    model = build_encoder(cfg)
    n = cfg.voxel_size
    rng = np.random.default_rng(0)
    img = 128
    rgbs = jnp.asarray(rng.integers(
        0, 255, (n_steps, 2, 1, img, img, 3)).astype(np.float32))
    pcds = jnp.asarray(rng.uniform(
        -0.5, 1.5, (n_steps, 2, 1, img, img, 3)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    lang_goal = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    lang_tok = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))

    p_act = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, n, n, n, 10)), jnp.zeros((1, 4)),
        jnp.zeros((1, 1024)), jnp.zeros((1, 77, 512)))
    p_stab = jax.jit(model.init)(
        jax.random.key(1), jnp.zeros((1, n, n, n, 10)), jnp.zeros((1, 4)),
        jnp.zeros((1, 1024)), jnp.zeros((1, 77, 512)))
    stacked = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), p_act, p_stab)
    decode = make_decode(cfg, 1)

    def one_step(carry, obs):
        step, bounds = carry
        rgb, pcd = obs
        params = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, step % 2, 0,
                                                   keepdims=False), stacked)
        coords = pcd.reshape(1, -1, 3)
        feats = ((rgb / 255.0) * 2.0 - 1.0).reshape(1, -1, 3)
        out, _, _ = apply_with_front(cfg, model, params, coords, feats, bounds,
                                  proprio, lang_goal, lang_tok)
        return (step + 1, bounds), decode(out, bounds)

    @jax.jit
    def chained(rgbs, pcds, bounds):
        return jax.lax.scan(one_step, (0, bounds), (rgbs, pcds))[1]

    return chained, rgbs, pcds


def time_dual_policy_chain(n_steps: int = 32):
    chained, rgbs, pcds = build_dual_chain(n_steps)
    import jax.numpy as jnp

    bounds = jnp.asarray([[-0.1, -0.3, 0.5, 0.5, 0.3, 1.1]], jnp.float32)
    acts = np.asarray(chained(rgbs, pcds, bounds))  # compile + warm
    assert acts.shape == (n_steps, 1, 9) and np.isfinite(acts).all()
    walls = []
    for _ in range(5):
        t0 = time.perf_counter()
        acts = np.asarray(chained(rgbs, pcds, bounds))
        walls.append(time.perf_counter() - t0)
    return n_steps / sorted(walls)[len(walls) // 2]


def build_vlm_stages():
    """The episode-frequency VLM pass on chip — OWL-ViT-base detection (768^2)
    + SAM-B box-prompted segmentation (1024^2, encoder + mask decoder), random
    weights (a perf number, vlm.py:144-194).

    The three stages are jitted SEPARATELY and chained on host: one giant
    scan-of-everything graph exceeds what the relay's AOT compiler finishes in
    reasonable time, and the real pipeline runs once per episode with host
    logic between stages anyway (vlm.py:144-194 moves detection boxes through
    numpy/o3d before prompting SAM). ``frame(i)`` returns (mask area, centroid
    y, centroid x in [0,1]) — the data the crop point derives from."""
    import jax
    import jax.numpy as jnp

    from voxactb_tpu.models.owlvit import OwlViTDetector, OwlViTImageEncoder
    from voxactb_tpu.models.sam_decoder import SamMaskDecoder
    from voxactb_tpu.models.sam_encoder import sam_vit_b

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    det = OwlViTDetector(
        embed_dim=512, image_encoder=OwlViTImageEncoder(dtype=bf), dtype=bf)
    det_params = jax.jit(det.init)(
        jax.random.key(0), jnp.zeros((1, 768, 768, 3)), jnp.zeros((2, 512)))
    sam = sam_vit_b(dtype=bf)
    sam_params = jax.jit(sam.init)(
        jax.random.key(1), jnp.zeros((1, 1024, 1024, 3)))
    dec = SamMaskDecoder(dtype=bf)
    dec_params = jax.jit(dec.init)(
        jax.random.key(2), jnp.zeros((1, 64, 64, 256)), jnp.zeros((1, 4)))

    @jax.jit
    def detect(params, img, txt):
        logits, boxes = det.apply(params, img, txt)
        best = jnp.argmax(logits.reshape(-1))
        box = boxes.reshape(-1, 4)[best]
        return jnp.stack([box[0] - box[2] / 2, box[1] - box[3] / 2,
                          box[0] + box[2] / 2, box[1] + box[3] / 2])

    sam_encode = jax.jit(sam.apply)

    @jax.jit
    def segment(params, emb, box_xyxy):
        masks, iou = dec.apply(params, emb, box_xyxy[None])
        sel = jnp.argmax(iou[0])
        m = (masks[0, sel] > 0).astype(jnp.float32)
        area = jnp.sum(m)
        h, w = m.shape
        ys = jnp.sum(m * jnp.arange(h, dtype=jnp.float32)[:, None])
        xs = jnp.sum(m * jnp.arange(w, dtype=jnp.float32)[None, :])
        denom = jnp.maximum(area, 1.0)
        return area, ys / denom / h, xs / denom / w

    n_frames = 4
    imgs_owl = jnp.asarray(rng.normal(size=(n_frames, 1, 768, 768, 3))
                           .astype(np.float32))
    imgs_sam = jnp.asarray(rng.normal(size=(n_frames, 1, 1024, 1024, 3))
                           .astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))

    def frame(i):
        box = detect(det_params, imgs_owl[i % n_frames], txt)
        emb = sam_encode(sam_params, imgs_sam[i % n_frames])
        area, cy, cx = segment(dec_params, emb, box)
        return float(area), float(cy), float(cx)

    return frame


def time_vlm_pass(n_frames: int = 4):
    """BASELINE staged config #3: ms per VLM frame (OWL-ViT + SAM-B, 3 stages)."""
    frame = build_vlm_stages()
    area, _, _ = frame(0)  # compile + warm all three stages
    assert area >= 0
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_frames):
            frame(i)
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[len(walls) // 2] / n_frames * 1000.0  # ms per frame


def time_episode(n_acts: int = 25):
    """BASELINE staged config #3 END-TO-END: the composed per-episode device
    path the reference runs once per rollout — one VLM pass (OWL-ViT detect +
    SAM encode + box-prompted mask), crop bounds derived from the mask centroid
    on host (get_new_scene_bounds_based_on_crop, helpers/utils.py:32), then
    ``episode_length`` alternating dual-policy acts at 50^3 inside the derived
    bounds (vlm.py:144-194 + rollout_generator.py:208-298). Returns
    (episode_ms, acts_per_s). Sim stepping/planning is host work the reference
    pays identically and is excluded — this is the device+glue path."""
    frame = build_vlm_stages()
    chained, rgbs, pcds = build_dual_chain(n_acts)
    import jax.numpy as jnp

    scene_lo = np.asarray([-0.8, -1.0, 0.1])
    scene_hi = np.asarray([1.2, 1.0, 2.1])
    radius = 0.3

    def episode():
        _, cy, cx = frame(0)
        # lift the normalized mask centroid to a world crop point inside the
        # scene volume (the reference goes through the masked point cloud;
        # the bounds->policy data dependency is what matters for timing)
        frac = np.asarray([cx, cy, 0.5 * (cx + cy)])
        center = scene_lo + frac * (scene_hi - scene_lo)
        bounds = jnp.asarray(
            np.concatenate([center - radius, center + radius])[None]
            .astype(np.float32))
        acts = np.asarray(chained(rgbs, pcds, bounds))
        assert acts.shape == (n_acts, 1, 9) and np.isfinite(acts).all()

    episode()  # compile + warm every stage
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        episode()
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    return med * 1000.0, n_acts / med


def time_sam_h(n_frames: int = 2):
    """BASELINE staged config #3 at the reference's tower size: SAM ViT-H
    encoder (632M params) at 1024^2, bf16, random weights — the heavy half of
    the per-episode VLM pass (vlm.py:109 loads sam_vit_h). Reported separately
    from time_vlm_pass (which uses ViT-B) because the relay's remote compiler
    may refuse programs this large (HTTP 500) — a tolerated, visible failure."""
    import jax
    import jax.numpy as jnp

    from voxactb_tpu.models.sam_encoder import sam_vit_h

    sam = sam_vit_h(dtype=jnp.bfloat16, fused_windowed=SAM_FUSED_WINDOWED)
    params = jax.jit(sam.init)(jax.random.key(0), jnp.zeros((1, 1024, 1024, 3)))
    # reduce on device: the [1,64,64,256] neck embedding feeds the on-device
    # mask decoder in production, so fetching it to the host is not part of
    # the encoder's cost — and on this relay the 4 MB fetch dominated the old
    # number (~300 ms reported vs 169.5 ms compute; see the round-5 stage
    # ladder, tools/profile_sam.py --stage: windowed 123.6 / patch 28.6 /
    # global 18.8 / neck 0.8 ms, sol_frac 0.556)
    f = jax.jit(lambda p, x: jnp.sum(sam.apply(p, x).astype(jnp.float32)))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(n_frames, 1, 1024, 1024, 3))
                       .astype(np.float32))
    np.asarray(f(params, imgs[0]))  # compile + warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_frames):
            np.asarray(f(params, imgs[i]))
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[len(walls) // 2] / n_frames * 1000.0


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from voxactb_tpu.config import MethodConfig

    # latency mode: z-shifted 2D conv decomposition wins at batch 1 (46 vs 65 ms);
    # throughput mode: plain conv3d wins at batch 8 (25.2 vs 19.8 steps/s)
    cfg_lat = MethodConfig(voxel_sizes=[100], which_arm="right",
                           compute_dtype="bfloat16", zshift_conv3d=True,
                           pallas_decoder=PALLAS_DECODER,
                           pallas_decoder_v3=PALLAS_DECODER_V3,
                       pallas_decoder_v2c=PALLAS_DECODER_V2C,
                       front_scatter_unroll=FRONT_UNROLL,
                       front_scatter_matmul=FRONT_MATMUL,
                           pallas_encoder=PALLAS_ENCODER,
                           pallas_front=PALLAS_FRONT,
                       pallas_attention=PALLAS_ATTN)
    # throughput mode: pallas kernels win at batch 8 too (27.3 vs 25.3 acts/s
    # paired A/B on-chip)
    cfg_thr = MethodConfig(voxel_sizes=[100], which_arm="right",
                           compute_dtype="bfloat16", zshift_conv3d=True,
                           pallas_decoder=PALLAS_DECODER,
                           pallas_decoder_v3=PALLAS_DECODER_V3,
                       pallas_decoder_v2c=PALLAS_DECODER_V2C,
                       front_scatter_unroll=FRONT_UNROLL,
                       front_scatter_matmul=FRONT_MATMUL,
                           pallas_encoder=PALLAS_ENCODER,
                           pallas_front=PALLAS_FRONT,
                       pallas_attention=PALLAS_ATTN)

    lat_chain, r1, p1 = build_chain(cfg_lat, batch=1)
    single_sps = time_chain(lat_chain, r1, p1, 1)

    value = single_sps
    batched_sps = None
    if os.environ.get("BENCH_SKIP_BATCHED") != "1":
        thr_chain, r8, p8 = build_chain(cfg_thr, batch=BATCH)
        batched_sps = time_chain(thr_chain, r8, p8, BATCH)
        value = max(value, batched_sps)

    # BC train-step throughput at the canonical training point: 50^3 VLM-cropped
    # grid, LAMB, SE(3) aug on device (BASELINE staged config #4; the reference
    # trains this at batch 1 on one GPU — scripts/train_open_jar_*.sh)
    train_sps, train_params = None, None
    if os.environ.get("BENCH_SKIP_TRAIN") != "1":
        try:
            train_sps, train_params = time_train_chain(batch=8)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            train_sps = None

    # BASELINE staged config #2: dual acting+stabilizing policies alternating
    dual_sps = None
    if os.environ.get("BENCH_SKIP_DUAL") != "1":
        try:
            dual_sps = time_dual_policy_chain()
        except Exception:
            traceback.print_exc(file=sys.stderr)
            dual_sps = None

    # BASELINE staged config #3: episode-frequency VLM pass (OWL-ViT + SAM-B)
    vlm_ms = None
    if os.environ.get("BENCH_SKIP_VLM") != "1":
        try:
            vlm_ms = time_vlm_pass()
        except Exception:
            traceback.print_exc(file=sys.stderr)
            vlm_ms = None

    sam_h_ms = None
    if os.environ.get("BENCH_SKIP_SAMH") != "1" \
            and os.environ.get("BENCH_SKIP_VLM") != "1":
        try:
            sam_h_ms = time_sam_h()
        except Exception:
            traceback.print_exc(file=sys.stderr)
            sam_h_ms = None

    # BASELINE staged config #3 composed: VLM once -> crop bounds -> 25 acts
    episode_ms, episode_aps = None, None
    if os.environ.get("BENCH_SKIP_EPISODE") != "1" \
            and os.environ.get("BENCH_SKIP_VLM") != "1":
        try:
            episode_ms, episode_aps = time_episode()
        except Exception:
            traceback.print_exc(file=sys.stderr)
            episode_ms = None

    # the VoxAct-B operating point: 50^3 VLM-cropped grid (launch_utils.py:341-347)
    crop50_sps = None
    if os.environ.get("BENCH_SKIP_CROP50") != "1":
        cfg50 = MethodConfig(voxel_sizes=[50], which_arm="right",
                             compute_dtype="bfloat16", zshift_conv3d=True,
                             pallas_decoder=PALLAS_DECODER,
                           pallas_decoder_v3=PALLAS_DECODER_V3,
                       pallas_decoder_v2c=PALLAS_DECODER_V2C,
                       front_scatter_unroll=FRONT_UNROLL,
                       front_scatter_matmul=FRONT_MATMUL,
                             pallas_encoder=PALLAS_ENCODER,
                             pallas_front=PALLAS_FRONT,
                       pallas_attention=PALLAS_ATTN)
        c50, r50, p50 = build_chain(cfg50, batch=1)
        crop50_sps = time_chain(c50, r50, p50, 1)

    per_chip_target = 1000.0 / 8.0

    # quantified roofline accounting (tools/cost_model.py): analytic FLOPs +
    # minimal HBM bytes of the act program vs measured relay ceilings
    # (tools/roofline.py: ~66 GB/s HBM, ~180 TFLOP/s marginal matmul) and
    # physical v5e specs (819 GB/s, 197 TFLOP/s bf16)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
    from cost_model import (act_cost, sam_encoder_cost, speed_of_light,
                            train_cost)

    cost = act_cost(n=100, batch=1, fused_decoder=PALLAS_DECODER,
                    fused_front=PALLAS_FRONT)
    measured_s = 1.0 / single_sps
    relay_bw, relay_flops = 66e9, 180e12
    sol_relay = speed_of_light(cost, relay_flops, relay_bw)
    sol_v5e = speed_of_light(cost)

    # batched-8 SOL: the act program is bandwidth-bound, so 8x the traffic at a
    # fixed 66 GB/s caps batched throughput near the single-act rate — the
    # quantified ceiling for the "batching buys nothing" observation
    cost_b8 = act_cost(n=100, batch=8, fused_decoder=PALLAS_DECODER,
                       fused_front=PALLAS_FRONT)
    sol_b8_relay = speed_of_light(cost_b8, relay_flops, relay_bw)

    # train-step roofline (fwd+bwd+LAMB at the canonical 50^3 batch-8 point;
    # remat matches time_train_chain's cfg — both read BENCH_TRAIN_REMAT)
    tcost = train_cost(n=50, batch=8, param_count=train_params or 35.7e6,
                       remat=os.environ.get("BENCH_TRAIN_REMAT", "0") == "1")
    sol_train_relay = speed_of_light(tcost, relay_flops, relay_bw)
    sol_train_v5e = speed_of_light(tcost)

    out = {
        "metric": "fused voxelize+Q-forward steps/sec @100^3 grid "
                  "(1x v5e chip via relay, bf16)",
        "value": round(float(value), 2),
        "unit": "steps/s",
        "vs_baseline": round(float(value / per_chip_target), 3),
        "p50_latency_ms": round(1000.0 / single_sps, 2),
        "model_gflops_per_act": round(cost["flops"] / 1e9, 1),
        "min_hbm_mb_per_act": round(cost["bytes"] / 1e6, 1),
        "mfu_pct": round(100 * cost["flops"] / (measured_s * relay_flops), 1),
        "hbm_util_pct": round(100 * cost["bytes"] / (measured_s * relay_bw), 1),
        "sol_ms_relay": round(sol_relay["sol_ms"], 2),
        "sol_frac_relay": round(sol_relay["sol_ms"] * single_sps / 1e3, 3),
        "sol_ms_physical_v5e": round(sol_v5e["sol_ms"], 2),
        "projected_steps_per_s_physical_v5e": round(1e3 / sol_v5e["sol_ms"], 1),
        "platform_note": "relay-virtualized chip sustains ~66GB/s HBM (vs 819 "
                         "physical) and ~1.9ms/op; see tools/roofline.py",
    }
    if batched_sps is not None:
        out["batched8_steps_per_s"] = round(float(batched_sps), 2)
        out["sol_frac_batched"] = round(
            sol_b8_relay["sol_ms"] / 1e3 * batched_sps / 8.0, 3)
        out["batched8_ceiling_acts_per_s"] = round(
            8e3 / sol_b8_relay["sol_ms"], 1)
        # per-stage relay ceilings at batch 8: the quantified proof of why
        # batching cannot pay on a bandwidth-starved part. Iterate the UNION of
        # flop- and byte-stage keys: the tail's memory floor lives under
        # "decoder_tail" while its FLOPs live under final_conv/trans/stats_u —
        # the old flops-keyed table silently dropped the 31.5 ms decoder_tail
        # memory term (caught by the round-4 measured-vs-SOL comparison)
        stage_keys = (set(cost_b8["flops_by_stage"])
                      | set(cost_b8["bytes_by_stage"]))
        out["batched8_stage_ceiling_ms"] = {
            k: {"ms": round(max(
                    cost_b8["flops_by_stage"].get(k, 0.0) / relay_flops,
                    cost_b8["bytes_by_stage"].get(k, 0.0) / relay_bw) * 1e3, 2),
                "bound": ("mem" if cost_b8["bytes_by_stage"].get(k, 0.0)
                          / relay_bw > cost_b8["flops_by_stage"].get(k, 0.0)
                          / relay_flops else "mxu")}
            for k in sorted(stage_keys)
        }
    if train_sps is not None:
        out["train50_samples_per_s"] = round(float(train_sps), 2)
        step_s = 8.0 / train_sps
        out["train_mfu_pct"] = round(
            100 * tcost["flops"] / (step_s * relay_flops), 1)
        out["train_sol_ms_relay"] = round(sol_train_relay["sol_ms"], 2)
        out["train_sol_frac_relay"] = round(
            sol_train_relay["sol_ms"] / 1e3 / step_s, 3)
        out["train_samples_per_s_sol_physical_v5e"] = round(
            8e3 / sol_train_v5e["sol_ms"], 1)
        out["train_param_bytes_mb"] = round(tcost["param_bytes"] / 1e6, 1)
    if dual_sps is not None:
        out["dual50_acts_per_s"] = round(float(dual_sps), 2)
    if vlm_ms is not None:
        out["vlm_ms_per_frame"] = round(float(vlm_ms), 2)
    if sam_h_ms is not None:
        out["sam_h_ms_per_frame"] = round(float(sam_h_ms), 2)
        scost = sam_encoder_cost()
        sol_samh = speed_of_light(scost, relay_flops, relay_bw)
        out["sam_h_sol_ms_relay"] = round(sol_samh["sol_ms"], 2)
        out["sam_h_sol_frac_relay"] = round(
            sol_samh["sol_ms"] / float(sam_h_ms), 3)
    if episode_ms is not None:
        out["episode50_ms"] = round(float(episode_ms), 1)
        out["episode50_acts_per_s"] = round(float(episode_aps), 2)
    if crop50_sps is not None:
        out["crop50_steps_per_s"] = round(float(crop50_sps), 2)
        out["crop50_latency_ms"] = round(1000.0 / crop50_sps, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
