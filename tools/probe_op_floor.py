"""Measure the relay's per-op dispatch/serialization floor, and count the
sequential ops in the flagship act program.

The pure-traffic roofline (tools/cost_model.py) charges only FLOPs and HBM
bytes; on the relay-virtualized chip each sequentially-dependent HLO op also
pays a fixed scheduling cost (measured here), which dominates small programs.
Relay SOL for a program with K sequential ops is then

    sol_ms = max(flops/F, bytes/B) * 1e3 + K * op_floor_ms

(a) op floor: chains of K dependent tiny [128,128] bf16 dots (dots never fuse
    into each other, so the chain is K real sequential HLO ops doing ~0 work);
    fit ms/op from two chain lengths to cancel the fixed fetch cost.
(b) K for the act program: lower+compile the 100^3 act chain (remote AOT is
    chipless) and count sequential instructions in the entry computation.

Run alone on the chip (never overlap TPU processes):
    python tools/probe_op_floor.py
"""

import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure_op_floor():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32),
                    jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(128, 128)).astype(np.float32) * 0.05,
                    jnp.bfloat16)

    def chain(k):
        @jax.jit
        def f(x, w):
            for _ in range(k):
                x = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
            return jnp.sum(x.astype(jnp.float32))
        return f

    def t(f, reps=5):
        out = np.asarray(f(x, w))  # compile + warm (fetch: relay returns early)
        assert np.isfinite(out)
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x, w))
            walls.append(time.perf_counter() - t0)
        return sorted(walls)[len(walls) // 2] * 1e3

    k_lo, k_hi = 16, 128
    ms_lo, ms_hi = t(chain(k_lo)), t(chain(k_hi))
    per_op_ms = (ms_hi - ms_lo) / (k_hi - k_lo)
    return {"chain16_ms": round(ms_lo, 2), "chain128_ms": round(ms_hi, 2),
            "per_op_ms": round(per_op_ms, 3),
            "fixed_fetch_ms": round(ms_lo - k_lo * per_op_ms, 2)}


def count_act_ops():
    """Sequential instruction count of the compiled 100^3 act program."""
    import jax
    import jax.numpy as jnp

    from voxactb_tpu.agents.qfunction import make_infer_fn
    from voxactb_tpu.config import MethodConfig

    flag = os.environ.get
    cfg = MethodConfig(
        voxel_sizes=[100], which_arm="right", compute_dtype="bfloat16",
        zshift_conv3d=True,
        pallas_decoder=flag("BENCH_PALLAS_DECODER", "1") == "1",
        pallas_decoder_v3=flag("BENCH_PALLAS_DECODER_V3", "0") == "1",
        pallas_encoder=flag("BENCH_PALLAS_ENCODER", "1") == "1",
        pallas_front=flag("BENCH_PALLAS_FRONT", "1") == "1")
    model, infer = make_infer_fn(cfg)

    rng = np.random.default_rng(0)
    b, img = 1, 128
    rgbs = tuple(jnp.asarray(rng.integers(0, 255, (b, img, img, 3))
                             .astype(np.float32)) for _ in range(2))
    pcds = tuple(jnp.asarray(rng.uniform(-0.5, 1.5, (b, img, img, 3))
                             .astype(np.float32)) for _ in range(2))
    proprio = jnp.asarray(rng.normal(size=(b, 4)).astype(np.float32))
    lang_goal = jnp.asarray(rng.normal(size=(b, 1024)).astype(np.float32))
    lang_tok = jnp.asarray(rng.normal(size=(b, 77, 512)).astype(np.float32))
    bounds = jnp.asarray([[-0.8, -1.0, 0.1, 1.2, 1.0, 2.1]], jnp.float32)
    params = model.init(jax.random.key(0), jnp.zeros((b, 100, 100, 100, 10)),
                        proprio, lang_goal, lang_tok)

    # make_infer_fn returns a @jax.jit-wrapped callable — lower it directly
    lowered = infer.lower(
        params, rgbs, pcds, proprio, lang_goal, lang_tok, bounds)
    txt = lowered.compile().as_text()
    entry = txt.split("ENTRY")[-1]
    # count real sequential instructions (skip parameters/constants/tuples)
    insts = re.findall(r"^\s+\S+ = \S+ (\w+)\(", entry, re.M)
    skip = {"parameter", "constant", "tuple", "get-tuple-element", "bitcast"}
    counted = [i for i in insts if i not in skip]
    from collections import Counter
    return {"entry_ops": len(counted),
            "by_kind": dict(Counter(counted).most_common(12))}


if __name__ == "__main__":
    out = {"op_floor": measure_op_floor()}
    try:
        out["act_program"] = count_act_ops()
    except Exception as e:  # remote AOT can reject very large text dumps
        out["act_program"] = {"error": str(e)[:200]}
    print(json.dumps(out))
