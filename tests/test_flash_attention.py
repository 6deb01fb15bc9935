"""Flash attention kernel (ops/pallas/flash_attention.py) parity vs the XLA
formulation, interpret mode on CPU; plus the perceiver trunk with
pallas_attention on vs off."""

import numpy as np

import jax
import jax.numpy as jnp

from voxactb_tpu.ops.pallas.flash_attention import flash_attention


def _xla(q, k, v):
    sim = jnp.einsum("bid,bjd->bij", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bij,bjd->bid", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def test_kernel_matches_xla(rng):
    bh, tq, tk, hd = 4, 24, 40, 16   # deliberately unaligned everywhere
    q = jnp.asarray(rng.normal(size=(bh, tq, hd)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bh, tk, hd)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bh, tk, hd)).astype(np.float32),
                    jnp.bfloat16)
    ref = np.asarray(_xla(q, k, v), np.float32)
    out = np.asarray(flash_attention(q, k, v, interpret=True), np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_kernel_multiblock_q(rng):
    bh, tq, tk, hd = 2, 96, 64, 8
    q = jnp.asarray(rng.normal(size=(bh, tq, hd)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(bh, tk, hd)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(bh, tk, hd)).astype(np.float32),
                    jnp.bfloat16)
    ref = np.asarray(_xla(q, k, v), np.float32)
    out = np.asarray(
        flash_attention(q, k, v, q_block=32, interpret=True), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_trunk_flash_matches_xla(rng):
    """Tiny perceiver: pallas_attention on (interpret) vs off, bf16."""
    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    def enc(flash):
        return PerceiverVoxelLangEncoder(
            depth=1, iterations=1, voxel_size=10, initial_dim=10,
            low_dim_size=4, num_rotation_classes=72, num_latents=16,
            latent_dim=32, cross_heads=1, latent_heads=2, cross_dim_head=16,
            latent_dim_head=16, voxel_patch_size=5, voxel_patch_stride=5,
            final_dim=8, pallas_attention=flash, pallas_interpret=True,
            dtype=jnp.bfloat16)

    grid = jnp.asarray(rng.normal(size=(1, 10, 10, 10, 10)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    lang_emb = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    lang_tok = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))

    params = enc(False).init(jax.random.key(0), grid, proprio, lang_emb,
                             lang_tok)
    out0 = enc(False).apply(params, grid, proprio, lang_emb, lang_tok)
    out1 = enc(True).apply(params, grid, proprio, lang_emb, lang_tok)
    for key in out0:
        np.testing.assert_allclose(
            np.asarray(out1[key], np.float32),
            np.asarray(out0[key], np.float32), atol=5e-2, rtol=5e-2,
            err_msg=key)
    # argmax of the translation head must agree (the action decode contract)
    assert (np.asarray(out0["trans"]).reshape(-1).argmax()
            == np.asarray(out1["trans"]).reshape(-1).argmax())


# ---------------------------------------------------------------------------
# flash_attention_train (custom VJP + in-kernel dropout)
# ---------------------------------------------------------------------------

def _mk(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32), jnp.bfloat16)


def test_train_kernel_fwd_and_grad_match_xla(rng):
    """dropout=0: forward and q/k/v grads match the XLA formulation."""
    from voxactb_tpu.ops.pallas.flash_attention import flash_attention_train

    bh, tq, tk, hd = 4, 24, 40, 16
    q, k, v = _mk(rng, bh, tq, hd), _mk(rng, bh, tk, hd), _mk(rng, bh, tk, hd)
    seed = jnp.zeros((), jnp.uint32)

    def loss_f(q, k, v):
        out = flash_attention_train(q, k, v, seed, dropout=0.0, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(_xla(q, k, v).astype(jnp.float32) ** 2)

    out = flash_attention_train(q, k, v, seed, dropout=0.0, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(_xla(q, k, v), np.float32),
                               atol=2e-2, rtol=2e-2)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-2,
                                   err_msg=f"d{name}")


def test_train_kernel_multiblock_grad(rng):
    """q split across several blocks: dk/dv accumulate across the grid."""
    from voxactb_tpu.ops.pallas.flash_attention import flash_attention_train

    bh, tq, tk, hd = 2, 96, 64, 8
    q, k, v = _mk(rng, bh, tq, hd), _mk(rng, bh, tk, hd), _mk(rng, bh, tk, hd)
    seed = jnp.zeros((), jnp.uint32)

    def loss_f(q, k, v):
        out = flash_attention_train(q, k, v, seed, dropout=0.0, q_block=32,
                                    interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(_xla(q, k, v).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-2,
                                   err_msg=f"d{name}")


def _expected_keep_mask(seed, bh, nq, qb, tk_pad, dropout):
    """Reproduce the kernel's counter-based mask outside the kernel."""
    from voxactb_tpu.ops.pallas.flash_attention import _hash_keep, _thr

    rows = []
    for h in range(bh):
        blocks = []
        for i in range(nq):
            base = jnp.uint32((h * nq + i) * qb * tk_pad)
            blocks.append(_hash_keep(jnp.uint32(seed), base, qb, tk_pad,
                                     _thr(dropout)))
        rows.append(jnp.concatenate(blocks, axis=0))
    return jnp.stack(rows)  # [bh, nq*qb, tk_pad]


def test_train_kernel_dropout_mask_consistency(rng):
    """Fwd output AND grads equal an XLA reference using the identical mask —
    proves the backward regenerates exactly the forward's dropout pattern."""
    from voxactb_tpu.ops.pallas.flash_attention import flash_attention_train

    bh, tq, tk, hd = 2, 32, 48, 16   # tq = 32 -> one q block of 32
    drop, seed = 0.25, 1234
    q, k, v = _mk(rng, bh, tq, hd), _mk(rng, bh, tk, hd), _mk(rng, bh, tk, hd)
    tk_pad = 128
    keep = _expected_keep_mask(seed, bh, 1, 32, tk_pad, drop)[:, :tq, :tk]

    def ref(q, k, v):
        sim = jnp.einsum("bid,bjd->bij", q, k,
                         preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim, axis=-1)
        attn = attn * keep / (1.0 - drop)
        return jnp.einsum("bij,bjd->bid", attn.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(v.dtype)

    out = flash_attention_train(q, k, v, jnp.uint32(seed), dropout=drop,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref(q, k, v), np.float32),
                               atol=3e-2, rtol=3e-2)

    def loss_f(q, k, v):
        out = flash_attention_train(q, k, v, jnp.uint32(seed), dropout=drop,
                                    interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(ref(q, k, v).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gx):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1.5e-2,
                                   err_msg=f"d{name}")


def test_train_kernel_dropout_rate_and_determinism(rng):
    from voxactb_tpu.ops.pallas.flash_attention import flash_attention_train

    drop = 0.1
    keep = _expected_keep_mask(99, 4, 2, 64, 256, drop)
    rate = 1.0 - float(jnp.mean(keep))
    assert abs(rate - drop) < 0.01, rate

    bh, tq, tk, hd = 2, 16, 24, 8
    q, k, v = _mk(rng, bh, tq, hd), _mk(rng, bh, tk, hd), _mk(rng, bh, tk, hd)
    a = flash_attention_train(q, k, v, jnp.uint32(5), dropout=drop,
                              interpret=True)
    b = flash_attention_train(q, k, v, jnp.uint32(5), dropout=drop,
                              interpret=True)
    c = flash_attention_train(q, k, v, jnp.uint32(6), dropout=drop,
                              interpret=True)
    assert bool(jnp.all(a == b))
    assert bool(jnp.any(a != c))


def test_trunk_flash_train_grads_match_xla(rng):
    """Tiny perceiver, train mode, dropout=0: grads with pallas_attention_train
    match the XLA attention path."""
    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    def enc(flash_train):
        return PerceiverVoxelLangEncoder(
            depth=1, iterations=1, voxel_size=10, initial_dim=10,
            low_dim_size=4, num_rotation_classes=72, num_latents=16,
            latent_dim=32, cross_heads=1, latent_heads=2, cross_dim_head=16,
            latent_dim_head=16, voxel_patch_size=5, voxel_patch_stride=5,
            final_dim=8, input_dropout=0.0, attn_dropout=0.0,
            decoder_dropout=0.0, pallas_attention_train=flash_train,
            pallas_interpret=True, dtype=jnp.bfloat16)

    grid = jnp.asarray(rng.normal(size=(1, 10, 10, 10, 10)).astype(np.float32))
    proprio = jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32))
    lang_emb = jnp.asarray(rng.normal(size=(1, 1024)).astype(np.float32))
    lang_tok = jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32))
    params = enc(False).init(jax.random.key(0), grid, proprio, lang_emb,
                             lang_tok)

    def loss(p, flash_train):
        out = enc(flash_train).apply(
            p, grid, proprio, lang_emb, lang_tok, train=True,
            rngs={"dropout": jax.random.key(1)})
        return sum(jnp.sum(v.astype(jnp.float32) ** 2)
                   for v in jax.tree_util.tree_leaves(out))

    l0, g0 = jax.value_and_grad(loss)(params, False)
    l1, g1 = jax.value_and_grad(loss)(params, True)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-2)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-2)
