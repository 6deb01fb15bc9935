"""Reference-checkpoint porting: key mapping covers the model's full param tree."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "tools")

from port_torch_checkpoint import (  # noqa: E402
    map_reference_qattention,
    reference_key_shapes,
)

from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder  # noqa: E402


def synthetic_state_dict(rng, **kw):
    shapes = reference_key_shapes(**kw)
    return {k: rng.normal(size=s).astype(np.float32) * 0.02
            for k, s in shapes.items()}


@pytest.mark.parametrize("arm_pred", [False, True])
def test_mapping_matches_model_tree(rng, arm_pred):
    depth, n, latents, latent_dim = 2, 10, 16, 512
    sd = synthetic_state_dict(rng, depth=depth, voxel_size=n, latents=latents,
                              latent_dim=latent_dim, arm_pred=arm_pred)
    # add the DDP prefix the reference strips (load_weights :845-855)
    sd = {f"_qnet.module.{k}": v for k, v in sd.items()}
    mapped = map_reference_qattention(sd, depth=depth, arm_pred=arm_pred)

    model = PerceiverVoxelLangEncoder(
        depth=depth, voxel_size=n, low_dim_size=4, num_latents=latents,
        latent_dim=latent_dim, arm_pred=arm_pred,
    )
    expected = jax.eval_shape(
        model.init, jax.random.key(0),
        jnp.zeros((1, n, n, n, 10)), jnp.zeros((1, 4)),
        jnp.zeros((1, 1024)), jnp.zeros((1, 77, 512)),
    )

    import flax

    flat_exp = flax.traverse_util.flatten_dict(expected["params"])
    flat_got = flax.traverse_util.flatten_dict(mapped["params"])
    missing = set(flat_exp) - set(flat_got)
    extra = set(flat_got) - set(flat_exp)
    assert not missing, f"unmapped params: {sorted(missing)}"
    assert not extra, f"spurious params: {sorted(extra)}"
    for k in flat_exp:
        assert flat_got[k].shape == flat_exp[k].shape, (
            k, flat_got[k].shape, flat_exp[k].shape)


def test_mapped_weights_run_forward(rng):
    depth, n = 1, 10
    sd = synthetic_state_dict(rng, depth=depth, voxel_size=n, latents=8,
                              latent_dim=512)
    mapped = map_reference_qattention(sd, depth=depth)
    model = PerceiverVoxelLangEncoder(depth=depth, voxel_size=n,
                                      low_dim_size=4, num_latents=8,
                                      latent_dim=512)
    out = model.apply(
        mapped,
        jnp.asarray(rng.normal(size=(1, n, n, n, 10)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1, 4)).astype(np.float32)),
        jnp.zeros((1, 1024), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 77, 512)).astype(np.float32)),
    )
    assert out["trans"].shape == (1, n, n, n, 1)
    assert np.isfinite(np.asarray(out["trans"])).all()
    assert np.isfinite(np.asarray(out["rot_grip"])).all()
