"""Probe usable VMEM scratch size and in-kernel shifted-slice einsum on this chip."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_scratch(mb):
    n_rows = mb * 1024 * 1024 // (128 * 4)

    def kernel(x_ref, o_ref, scratch):
        scratch[0, :] = x_ref[0, :]
        o_ref[0, :] = scratch[0, :]

    x = jnp.ones((8, 128), jnp.float32)
    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_rows, 128), jnp.float32)],
        )(x)
        np.asarray(y)
        return True
    except Exception as e:
        print(f"  {mb}MB failed: {str(e)[:200]}", flush=True)
        return False


def probe_shifted_einsum():
    """27-tap shifted-window matmul on a padded [102,102,128] block -> [100,100,64]."""
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.normal(size=(102, 102, 128)).astype(np.float32),
                     jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(9, 128, 64)).astype(np.float32) * 0.1,
                    jnp.bfloat16)

    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((100, 100, 64), jnp.float32)
        i = 0
        for dy in range(3):
            for dx in range(3):
                sl = x_ref[dy:dy + 100, dx:dx + 100, :]
                acc = acc + jnp.einsum(
                    "yxc,cf->yxf", sl, w_ref[i],
                    preferred_element_type=jnp.float32)
                i += 1
        o_ref[...] = acc

    f = jax.jit(lambda x, w: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((100, 100, 64), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w))
    y = np.asarray(f(xp, w))
    # reference
    ref = np.zeros((100, 100, 64), np.float32)
    xn = np.asarray(xp, np.float32)
    wn = np.asarray(w, np.float32)
    i = 0
    for dy in range(3):
        for dx in range(3):
            ref += xn[dy:dy + 100, dx:dx + 100, :] @ wn[i]
            i += 1
    err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    t0 = time.time()
    for _ in range(50):
        y = f(xp, w)
    jax.block_until_ready(y)
    dt = (time.time() - t0) / 50 * 1000
    print(f"shifted einsum ok, rel err {err:.2e}, {dt:.3f} ms/call", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for mb in [16, 24, 32, 48, 64, 96]:
        ok = probe_scratch(mb)
        print(f"scratch {mb}MB: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            break
    probe_shifted_einsum()
