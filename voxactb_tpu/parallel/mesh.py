"""jax.sharding Mesh utilities: data-parallel + FSDP sharding for the BC train step.

The reference's distribution story is one process per GPU + DDP gradient all-reduce over
a gloo TCP group (peract/train.py:95-105, run_seed_fn.py:34-36,
qattention_peract_bc_agent.py:50-54). None of that is ported as code: a single jitted
train step with a batch sharded over the ``dp`` mesh axis gives gradient all-reduce over
ICI for free, and sharding parameters over ``fsdp`` adds ZeRO-style weight sharding the
reference never had (SURVEY §2.7). Multi-host runs reuse the same program under
``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh. Default: all devices on one ``dp`` axis.

    ``axis_sizes`` e.g. ``{"dp": 4, "fsdp": 2}`` — product must equal device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not axis_sizes:
        axis_sizes = {"dp": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {axis_sizes} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dim of every array in the batch over ``axis``."""
    return NamedSharding(mesh, P(axis))


def fsdp_param_spec(shape: Sequence[int], axis_size: int,
                    min_elems: int = 2 ** 16) -> P:
    """PartitionSpec sharding a parameter's largest divisible dim over ``fsdp``.

    Small leaves stay replicated (sharding tiny tensors costs more in collectives than
    it saves in HBM).
    """
    if not shape or int(np.prod(shape)) < min_elems:
        return P()
    # prefer the largest dimension divisible by the axis size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % axis_size == 0:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def shard_params_fsdp(mesh: Mesh, params, axis: str = "fsdp"):
    """Produce NamedShardings for a param pytree (largest-dim sharding over ``axis``)."""
    if axis not in mesh.axis_names:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    size = mesh.shape[axis]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, fsdp_param_spec(leaf.shape, size)),
        params,
    )


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


# -- tensor / sequence parallelism (TPU-native; the reference has none — §2.7) -----

# megatron-style rules by param-path substring: column-parallel projections shard
# their OUTPUT features, row-parallel projections shard their INPUT features, so a
# (col -> row) pair needs exactly one psum at the row output (GSPMD inserts it).
_TP_COL = ("to_q/kernel", "to_kv/kernel", "w_in/kernel", "dense0")
_TP_ROW = ("to_out/kernel", "w_out/kernel")


def tp_param_spec(path: str, shape: Sequence[int], tp_size: int,
                  sp_size: int = 1) -> Optional[P]:
    """Megatron-style PartitionSpec for one param, or None when no rule applies.

    - attention q/kv and MLP up-projections: column-parallel (shard out dim)
    - attention out and MLP down-projections: row-parallel (shard in dim)
    - conv kernels (rank 5): shard output channels
    - ``latents`` table: shard the latent-sequence axis over ``sp`` (the natural
      "sequence" scale axis of the Perceiver — SURVEY §5 long-context note)
    """
    if not shape:
        return None
    if path.endswith("latents") and sp_size > 1 and shape[0] % sp_size == 0:
        return P("sp", *([None] * (len(shape) - 1)))
    if tp_size <= 1:
        return None
    if any(s in path for s in _TP_COL) and len(shape) == 2 \
            and shape[1] % tp_size == 0:
        return P(None, "tp")
    if any(s in path for s in _TP_ROW) and len(shape) == 2 \
            and shape[0] % tp_size == 0:
        return P("tp", None)
    if len(shape) == 5 and shape[-1] % tp_size == 0 and shape[-1] >= 2 * tp_size:
        return P(None, None, None, None, "tp")
    return None


def shard_params_model_parallel(mesh: Mesh, params):
    """NamedShardings combining tp/sp rules with the fsdp fallback."""
    tp_size = mesh.shape.get("tp", 1)
    sp_size = mesh.shape.get("sp", 1)
    fsdp_size = mesh.shape.get("fsdp", 1)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shards = []
    for path, leaf in flat:
        pstr = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = tp_param_spec(pstr, leaf.shape, tp_size, sp_size)
        if spec is None and fsdp_size > 1:
            spec = fsdp_param_spec(leaf.shape, fsdp_size)
        shards.append(NamedSharding(mesh, spec if spec is not None else P()))
    return jax.tree_util.tree_unflatten(treedef, shards)


def make_parallel_train_step(mesh: Mesh, init_fn, train_step, example_batch,
                             rng, fsdp: bool = False, model_parallel: bool = False):
    """Place state + batch on the mesh and return (state, sharded_step).

    - batch: leading dim over ``dp`` (+ ``fsdp`` if present, flattened data-parallel —
      the standard 2D "dp x fsdp both consume batch" layout);
    - params/opt state: replicated, or largest-dim sharded over ``fsdp``, or
      (``model_parallel=True``) megatron tp + latent-sequence sp + fsdp fallback;
    - gradients all-reduce over ICI automatically via jit's SPMD partitioner.
    """
    data_axes = tuple(a for a in ("dp", "fsdp") if a in mesh.axis_names) or \
        (mesh.axis_names[0],)
    batch_shard = NamedSharding(mesh, P(data_axes))
    batch_size = np.shape(example_batch["trans_action_indicies"])[0]

    def place_batch(batch):
        # only arrays with the batch leading dim shard over data axes; everything
        # else (e.g. a [6] scene_bounds vector) replicates
        return {
            k: jax.device_put(v, batch_shard)
            if np.ndim(v) and np.shape(v)[0] == batch_size
            else jax.device_put(v, replicate(mesh))
            for k, v in batch.items()
        }

    state = init_fn(rng, example_batch)
    # the optimizer moments (LAMB/Adam mu+nu) are ~2x the param bytes and
    # mirror the param tree inside the opt state, so they shard by the SAME
    # rules — replicating them forfeits most of the ZeRO memory win. The tp
    # path rules substring-match, so the longer opt-state paths (.../mu/
    # params/...) hit the same specs; scalars (count) fall through to P().
    if model_parallel:
        param_shards = shard_params_model_parallel(mesh, state.params)
        opt_shards = shard_params_model_parallel(mesh, state.opt_state)
        state = state.replace(
            params=jax.tree.map(jax.device_put, state.params, param_shards),
            opt_state=jax.tree.map(jax.device_put, state.opt_state,
                                   opt_shards),
            step=jax.device_put(state.step, replicate(mesh)),
        )
    elif fsdp and "fsdp" in mesh.axis_names:
        param_shards = shard_params_fsdp(mesh, state.params)
        opt_shards = shard_params_fsdp(mesh, state.opt_state)
        state = state.replace(
            params=jax.tree.map(jax.device_put, state.params, param_shards),
            opt_state=jax.tree.map(jax.device_put, state.opt_state,
                                   opt_shards),
            step=jax.device_put(state.step, replicate(mesh)),
        )
    else:
        state = jax.device_put(state, replicate(mesh))

    return state, place_batch, train_step
