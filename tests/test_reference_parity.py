"""End-to-end numeric parity against the ACTUAL reference torch modules.

Loads the reference ``PerceiverVoxelLangEncoder`` (perceiver_lang_io.py:136-485) and
``VoxelGrid`` (voxel/voxel_grid.py:15-198) from /root/reference, initializes a small
torch config, ports its state_dict through ``map_reference_qattention``
(tools/port_torch_checkpoint.py) and asserts that this framework's forward pass
reproduces the reference Q-values — the checkpoint-parity contract from SURVEY §7
step 2. Skips cleanly when the reference tree or torch is unavailable.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_PERACT = "/root/reference/peract"
REF_PERCEIVER = os.path.join(REF_PERACT, "agents", "peract_bc",
                             "perceiver_lang_io.py")
REF_VOXEL_GRID = os.path.join(REF_PERACT, "voxel", "voxel_grid.py")

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PERCEIVER), reason="reference tree unavailable")


def _load_ref_module(path, name):
    """Import a reference module file directly (no package __init__ execution)."""
    if REF_PERACT not in sys.path:
        sys.path.insert(0, REF_PERACT)  # for its `from helpers...` imports
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# small-but-structured config: all the heads, 2 self-attn layers, 20^3 grid
CFG = dict(depth=2, voxel_size=20, initial_dim=10, low_dim_size=4,
           num_latents=16, latent_dim=32, im_channels=16, final_dim=16,
           cross_heads=1, latent_heads=2, cross_dim_head=16, latent_dim_head=16,
           voxel_patch_size=5, voxel_patch_stride=5, activation="lrelu")


def _torch_encoder(arm_pred: bool):
    ref = _load_ref_module(REF_PERCEIVER, "ref_perceiver_lang_io")
    torch.manual_seed(0)
    enc = ref.PerceiverVoxelLangEncoder(
        iterations=1, input_dropout=0.0, attn_dropout=0.0, decoder_dropout=0.0,
        arm_pred_loss=arm_pred, **CFG)
    enc.eval()
    return enc


def _inputs(rng, b=2):
    n, low_dim = CFG["voxel_size"], CFG["low_dim_size"]
    grid = rng.normal(size=(b, n, n, n, 10)).astype(np.float32)
    proprio = rng.normal(size=(b, low_dim)).astype(np.float32)
    lang_goal = rng.normal(size=(b, 1024)).astype(np.float32)
    lang_tok = rng.normal(size=(b, 77, 512)).astype(np.float32)
    return grid, proprio, lang_goal, lang_tok


def _jax_encoder(arm_pred: bool):
    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    return PerceiverVoxelLangEncoder(
        depth=CFG["depth"], voxel_size=CFG["voxel_size"],
        initial_dim=CFG["initial_dim"], low_dim_size=CFG["low_dim_size"],
        num_latents=CFG["num_latents"], latent_dim=CFG["latent_dim"],
        im_channels=CFG["im_channels"], final_dim=CFG["final_dim"],
        cross_heads=CFG["cross_heads"], latent_heads=CFG["latent_heads"],
        cross_dim_head=CFG["cross_dim_head"],
        latent_dim_head=CFG["latent_dim_head"],
        voxel_patch_size=CFG["voxel_patch_size"],
        voxel_patch_stride=CFG["voxel_patch_stride"],
        activation=CFG["activation"], arm_pred=arm_pred,
        input_dropout=0.0, attn_dropout=0.0, decoder_dropout=0.0,
        # exact reference math: no fast approximations in the parity test
        fused_upsample=False, zshift_conv3d=False, pallas_stats=False,
    )


@pytest.mark.parametrize("arm_pred", [False, True])
def test_ported_reference_forward_parity(rng, arm_pred):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from port_torch_checkpoint import map_reference_qattention

    import jax.numpy as jnp

    enc_t = _torch_encoder(arm_pred)
    grid, proprio, lang_goal, lang_tok = _inputs(rng)

    with torch.no_grad():
        out_t = enc_t(
            torch.from_numpy(grid).permute(0, 4, 1, 2, 3),  # NDHWC -> NCDHW
            torch.from_numpy(proprio),
            torch.from_numpy(lang_goal),
            torch.from_numpy(lang_tok),
            None, None, None,
        )
    trans_t = out_t[0].permute(0, 2, 3, 4, 1).numpy()       # -> NDHWC
    rot_grip_t, collision_t = out_t[1].numpy(), out_t[2].numpy()

    params = map_reference_qattention(
        enc_t.state_dict(), depth=CFG["depth"], arm_pred=arm_pred)
    enc_j = _jax_encoder(arm_pred)
    out_j = enc_j.apply(params, jnp.asarray(grid), jnp.asarray(proprio),
                        jnp.asarray(lang_goal), jnp.asarray(lang_tok))

    np.testing.assert_allclose(np.asarray(out_j["trans"]), trans_t,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j["rot_grip"]), rot_grip_t,
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j["collision"]), collision_t,
                               atol=2e-4, rtol=2e-4)
    if arm_pred:
        np.testing.assert_allclose(np.asarray(out_j["arm"]), out_t[3].numpy(),
                                   atol=2e-4, rtol=2e-4)

    # action-level parity: identical argmax decisions on every head
    b = grid.shape[0]
    assert (np.asarray(out_j["trans"]).reshape(b, -1).argmax(-1)
            == trans_t.reshape(b, -1).argmax(-1)).all()
    for s in range(3):
        seg = slice(72 * s, 72 * (s + 1))
        assert (np.asarray(out_j["rot_grip"])[:, seg].argmax(-1)
                == rot_grip_t[:, seg].argmax(-1)).all()
    assert (np.asarray(out_j["rot_grip"])[:, 216:].argmax(-1)
            == rot_grip_t[:, 216:].argmax(-1)).all()
    assert (np.asarray(out_j["collision"]).argmax(-1)
            == collision_t.argmax(-1)).all()


@pytest.mark.skipif(not os.path.exists(REF_VOXEL_GRID),
                    reason="reference voxel_grid.py unavailable")
def test_voxelize_matches_reference_torch(rng):
    """Our jitted voxelizer vs the reference torch VoxelGrid, same random cloud."""
    import jax.numpy as jnp

    ref_vg = _load_ref_module(REF_VOXEL_GRID, "ref_voxel_grid")

    b, p, n = 2, 1024, 20
    bounds = np.array([-0.5, -0.5, 0.2, 0.7, 0.7, 1.4], np.float32)
    coords = rng.uniform(bounds[:3] - 0.1, bounds[3:] + 0.1,
                         (b, p, 3)).astype(np.float32)
    feats = rng.uniform(-1, 1, (b, p, 3)).astype(np.float32)

    vg = ref_vg.VoxelGrid(
        coord_bounds=bounds, voxel_size=n, device="cpu", batch_size=b,
        feature_size=3, max_num_coords=p)
    with torch.no_grad():
        ref_grid = vg.coords_to_bounding_voxel_grid(
            torch.from_numpy(coords), torch.from_numpy(feats),
            coord_bounds=torch.from_numpy(np.tile(bounds, (b, 1)))).numpy()

    from voxactb_tpu.ops.voxelize import voxelize

    got = np.asarray(voxelize(
        jnp.asarray(coords), jnp.asarray(feats),
        jnp.asarray(np.tile(bounds, (b, 1))), voxel_size=n))
    assert got.shape == ref_grid.shape
    np.testing.assert_allclose(got, ref_grid, atol=1e-5, rtol=1e-5)


REF_2ROBOTS = REF_PERCEIVER  # same file, PerceiverVoxelLang2RobotsEncoder :488


def test_ported_reference_two_robots_forward_parity(rng):
    """The 'one_policy_more_heads' variant vs the reference
    PerceiverVoxelLang2RobotsEncoder (perceiver_lang_io.py:488-860): ported
    weights must reproduce right- AND left-arm head outputs and argmaxes."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from port_torch_checkpoint import map_reference_qattention

    import jax.numpy as jnp

    ref = _load_ref_module(REF_PERCEIVER, "ref_perceiver_lang_io_2r")
    torch.manual_seed(0)
    enc_t = ref.PerceiverVoxelLang2RobotsEncoder(
        iterations=1, input_dropout=0.0, attn_dropout=0.0, decoder_dropout=0.0,
        **CFG)
    enc_t.eval()

    grid, proprio, lang_goal, lang_tok = _inputs(rng)
    proprio_left = rng.normal(size=proprio.shape).astype(np.float32)

    with torch.no_grad():
        out_t = enc_t(
            torch.from_numpy(grid).permute(0, 4, 1, 2, 3),
            torch.from_numpy(proprio), torch.from_numpy(proprio_left),
            torch.from_numpy(lang_goal), torch.from_numpy(lang_tok),
            None, None, None,
        )
    trans_r = out_t[0].permute(0, 2, 3, 4, 1).numpy()
    rot_grip_r, collision_r = out_t[1].numpy(), out_t[2].numpy()
    trans_l = out_t[3].permute(0, 2, 3, 4, 1).numpy()
    rot_grip_l, collision_l = out_t[4].numpy(), out_t[5].numpy()

    params = map_reference_qattention(
        enc_t.state_dict(), depth=CFG["depth"], two_arm_heads=True)

    from voxactb_tpu.models.perceiver import PerceiverVoxelLangEncoder

    enc_j = PerceiverVoxelLangEncoder(
        depth=CFG["depth"], voxel_size=CFG["voxel_size"],
        initial_dim=CFG["initial_dim"], low_dim_size=CFG["low_dim_size"],
        num_latents=CFG["num_latents"], latent_dim=CFG["latent_dim"],
        im_channels=CFG["im_channels"], final_dim=CFG["final_dim"],
        cross_heads=CFG["cross_heads"], latent_heads=CFG["latent_heads"],
        cross_dim_head=CFG["cross_dim_head"],
        latent_dim_head=CFG["latent_dim_head"],
        voxel_patch_size=CFG["voxel_patch_size"],
        voxel_patch_stride=CFG["voxel_patch_stride"],
        activation=CFG["activation"], num_proprio=2, two_arm_heads=True,
        input_dropout=0.0, attn_dropout=0.0, decoder_dropout=0.0,
        fused_upsample=False, zshift_conv3d=False, pallas_stats=False,
    )
    stacked = np.stack([proprio, proprio_left], axis=1)  # [B, 2, low_dim]
    out_j = enc_j.apply(params, jnp.asarray(grid), jnp.asarray(stacked),
                        jnp.asarray(lang_goal), jnp.asarray(lang_tok))

    for key, want in (("trans_right", trans_r), ("rot_grip_right", rot_grip_r),
                      ("collision_right", collision_r), ("trans_left", trans_l),
                      ("rot_grip_left", rot_grip_l),
                      ("collision_left", collision_l)):
        np.testing.assert_allclose(np.asarray(out_j[key]), want,
                                   atol=2e-4, rtol=2e-4, err_msg=key)

    b = grid.shape[0]
    for key, want in (("trans_right", trans_r), ("trans_left", trans_l)):
        assert (np.asarray(out_j[key]).reshape(b, -1).argmax(-1)
                == want.reshape(b, -1).argmax(-1)).all(), key
    for key, want in (("rot_grip_right", rot_grip_r),
                      ("rot_grip_left", rot_grip_l)):
        got = np.asarray(out_j[key])
        for s in range(3):
            seg = slice(72 * s, 72 * (s + 1))
            assert (got[:, seg].argmax(-1) == want[:, seg].argmax(-1)).all(), key
        assert (got[:, 216:].argmax(-1) == want[:, 216:].argmax(-1)).all(), key
