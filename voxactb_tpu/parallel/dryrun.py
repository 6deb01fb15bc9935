"""Multi-chip / multi-process dry-run machinery.

The reference actually runs N processes with a TCP rendezvous
(peract/train.py:95-105 ``mp.spawn`` + ``dist.init_process_group("gloo")``,
run_seed_fn.py:34-36). The TPU-native equivalent is ``jax.distributed.initialize``
+ ONE jitted train step over a global ``Mesh`` — GSPMD inserts the cross-process
collectives. This module provides:

- :func:`tiny_train_setup` — the small-but-structured BC train config + batch shared
  by the single-process dryrun (__graft_entry__.dryrun_multichip) and the
  multi-process worker;
- :func:`run_worker` — one process of an ``num_processes``-way distributed run over
  virtual CPU devices (the worker entry, ``python -m voxactb_tpu.parallel.dryrun``);
- :func:`spawn_two_process_dryrun` — launches 2 OS processes on localhost, waits,
  and returns the (identical) loss trajectories both printed.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import Dict, List

import numpy as np


def tiny_train_setup(batch_size: int, img: int = 8):
    """Tiny BC train setup (same knobs as __graft_entry__.dryrun_multichip)."""
    from voxactb_tpu.agents.qfunction import make_optimizer, make_train_step
    from voxactb_tpu.config import MethodConfig

    cfg = MethodConfig(
        voxel_sizes=[10], num_latents=16, latent_dim=32, transformer_depth=1,
        cross_dim_head=16, latent_dim_head=16, final_dim=8,
        which_arm="dominant", arm_pred_loss=True, apply_se3=True,
    )
    cameras = ["wrist", "wrist2"]
    optimizer = make_optimizer(cfg, training_iterations=100)
    _, init_fn, train_step = make_train_step(cfg, optimizer, cameras)

    rng = np.random.default_rng(0)
    b = batch_size
    batch = {
        "trans_action_indicies": rng.integers(0, 10, (b, 3)).astype(np.int32),
        "rot_grip_action_indicies": np.concatenate(
            [rng.integers(0, 72, (b, 3)), rng.integers(0, 2, (b, 1))], -1
        ).astype(np.int32),
        "ignore_collisions": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "gripper_pose": np.concatenate(
            [rng.uniform([-0.3, -0.5, 0.5], [0.7, 0.5, 1.5], (b, 3)),
             rng.normal(size=(b, 4))], -1).astype(np.float32),
        "lang_goal_emb": rng.normal(size=(b, 1024)).astype(np.float32),
        "lang_token_embs": rng.normal(size=(b, 77, 512)).astype(np.float32),
        "low_dim_state": rng.normal(size=(b, cfg.low_dim_size())).astype(
            np.float32),
        "label": rng.integers(0, 2, (b, 1)).astype(np.int32),
        "scene_bounds": np.asarray([-0.8, -1.0, 0.1, 1.2, 1.0, 2.1], np.float32),
    }
    batch["gripper_pose"][:, 3:] /= np.linalg.norm(
        batch["gripper_pose"][:, 3:], axis=-1, keepdims=True)
    for c in cameras:
        batch[f"{c}_rgb"] = rng.integers(
            0, 255, (b, img, img, 3)).astype(np.float32)
        batch[f"{c}_point_cloud"] = rng.uniform(
            -0.5, 1.5, (b, img, img, 3)).astype(np.float32)
    return cfg, init_fn, train_step, batch


def _place_global(x, sharding):
    """Host array (identical on every process) -> global sharded jax.Array."""
    import jax

    return jax.make_array_from_callback(
        np.shape(x), sharding, lambda idx: np.asarray(x)[idx])


def run_worker(process_id: int, num_processes: int, coordinator: str,
               local_devices: int, steps: int = 3) -> List[float]:
    """One process of the distributed dryrun. Prints per-step losses on rank 0."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/voxactb_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    n_global = len(jax.devices())
    assert n_global == num_processes * local_devices, (
        f"expected {num_processes * local_devices} global devices, "
        f"got {n_global}")

    from jax.sharding import NamedSharding, PartitionSpec as P

    from voxactb_tpu.parallel.mesh import make_mesh

    cfg, init_fn, train_step, batch = tiny_train_setup(batch_size=n_global)
    mesh = make_mesh({"dp": n_global})
    batch_shard = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    # every process holds the same full host batch (seeded); global arrays are
    # assembled shard-by-shard so no cross-process data movement happens here
    b = batch["trans_action_indicies"].shape[0]
    device_batch = {
        k: _place_global(v, batch_shard if np.ndim(v) and np.shape(v)[0] == b
                         else repl)
        for k, v in batch.items()
    }

    state_host = init_fn(jax.random.key(0), batch)
    state = jax.tree.map(lambda x: _place_global(x, repl), state_host)

    # AOT-compile BEFORE the first execution, then align both processes at a
    # coordination-service barrier: XLA:CPU's gloo context gives peers only
    # ~30s to rendezvous at the first collective, while compile skew between
    # two workers sharing one CPU can reach minutes (GetKeyValue() timed out)
    step_fn = train_step
    try:
        step_fn = train_step.lower(
            state, device_batch, jax.random.key(1)).compile()
    except Exception as e:  # pragma: no cover
        print(f"AOT compile unavailable ({type(e).__name__}: {e}); "
              "falling back to jit-on-first-call", flush=True)
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            _dist.global_state.client.wait_at_barrier(
                "dryrun_compiled", 900_000)
    except Exception as e:  # pragma: no cover
        print(f"coordination barrier skipped: {type(e).__name__}", flush=True)

    losses = []
    for i in range(steps):
        state, metrics = step_fn(state, device_batch, jax.random.key(1 + i))
        loss = float(np.asarray(metrics["total_loss"]))
        losses.append(loss)
        if process_id == 0:
            print(f"distributed step {i}: loss={loss:.6f}", flush=True)
    assert all(np.isfinite(l) for l in losses)
    if process_id == 0:
        print(f"distributed dryrun OK: {num_processes} processes x "
              f"{local_devices} devices, losses={losses}", flush=True)
    # the steps above are the verification; a shutdown-barrier timeout (workers
    # skewed by minutes on a contended 1-CPU box) must not fail the dryrun
    try:
        jax.distributed.shutdown()
    except Exception as e:  # pragma: no cover - contention-dependent
        print(f"distributed shutdown tolerated: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
    return losses


def spawn_two_process_dryrun(n_devices: int, steps: int = 3,
                             timeout: int = 900) -> List[float]:
    """Launch the 2-process rendezvous on localhost; returns rank-0's losses."""
    assert n_devices % 2 == 0, "need an even device count for 2 processes"
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    local = n_devices // 2

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)

    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "voxactb_tpu.parallel.dryrun",
             "--process-id", str(pid), "--num-processes", "2",
             "--coordinator", coordinator, "--local-devices", str(local),
             "--steps", str(steps)],
            cwd=repo_root, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            raise RuntimeError(f"distributed worker timed out:\n{out[-2000:]}")
        outs.append(out)
        if p.returncode != 0 and "worker-exit-ok" not in out:
            raise RuntimeError(
                f"distributed worker rc={p.returncode}:\n{out[-3000:]}")
    losses = []
    for line in outs[0].splitlines():
        if line.startswith("distributed step"):
            losses.append(float(line.rsplit("=", 1)[1]))
    if len(losses) != steps:
        raise RuntimeError(f"rank 0 printed {len(losses)} losses, "
                           f"expected {steps}:\n{outs[0][-3000:]}")
    return losses


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local-devices", type=int, required=True)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args(argv)
    run_worker(args.process_id, args.num_processes, args.coordinator,
               args.local_devices, args.steps)
    # the work is done and verified; skip atexit (a jax.distributed re-shutdown
    # can raise on the coordination-service race the worker already tolerated)
    print("worker-exit-ok", flush=True)
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
