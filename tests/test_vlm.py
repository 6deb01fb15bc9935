"""VLM crop geometry: mask -> crop point + auto radius (no model weights needed)."""

import numpy as np
import pytest

from voxactb_tpu.vlm import (
    VLM,
    GroundTruthLocalizer,
    MaskLocalizer,
    crop_point_from_mask,
    task_queries,
)
from voxactb_tpu.vlm.pipeline import JAR_FALLBACK_POINT, voxel_downsample


def scene(rng, h=32, w=32, obj_center=(0.2, -0.1, 0.9), obj_size=0.06):
    pcd = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    pcd[..., 2] += 1.0
    mask = np.zeros((h, w), bool)
    mask[5:15, 5:15] = True
    pcd[mask] = np.asarray(obj_center) + rng.uniform(
        -obj_size / 2, obj_size / 2, (mask.sum(), 3)).astype(np.float32)
    rgb = np.zeros((h, w, 3), np.uint8)
    return rgb, pcd, mask


def test_crop_point_is_object_centroid(rng):
    _, pcd, mask = scene(rng)
    point, radius = crop_point_from_mask(mask, pcd)
    np.testing.assert_allclose(point, [0.2, -0.1, 0.9], atol=0.02)
    # auto radius = largest object dim + 5cm (vlm.py:182-192)
    assert 0.05 < radius < 0.15


def test_open_jar_keeps_good_detection(rng):
    """A plausibly-sized jar detection keeps its measured centroid — the
    fallback must NOT overwrite a good measurement (the old unconditional
    z-override put the crop 3.5cm under this repo's own jar height)."""
    _, pcd, mask = scene(rng)
    point, _ = crop_point_from_mask(mask, pcd, task_name="open_jar")
    np.testing.assert_allclose(point, [0.2, -0.1, 0.9], atol=0.02)


def test_open_jar_fallback_on_implausible_detection(rng):
    """vlm.py:177-180: an implausibly large 'jar' means the detector missed —
    use the fixed workspace-center crop point."""
    _, pcd, mask = scene(rng, obj_size=0.5)  # half-meter 'jar'
    point, _ = crop_point_from_mask(mask, pcd, task_name="open_jar")
    np.testing.assert_allclose(point, JAR_FALLBACK_POINT, atol=1e-6)


def test_empty_mask_raises(rng):
    _, pcd, _ = scene(rng)
    with pytest.raises(ValueError, match="empty object mask"):
        crop_point_from_mask(np.zeros(pcd.shape[:2], bool), pcd)


def test_nonfinite_points_ignored(rng):
    _, pcd, mask = scene(rng)
    pcd[6, 6] = np.nan
    point, _ = crop_point_from_mask(mask, pcd)
    assert np.isfinite(point).all()


def test_voxel_downsample_reduces_density(rng):
    pts = rng.normal(size=(5000, 3)).astype(np.float32) * 0.01  # 1cm cluster
    down = voxel_downsample(pts, voxel=0.01)
    assert 1 <= len(down) < len(pts)
    # centroid preserved approximately
    np.testing.assert_allclose(down.mean(0), pts.mean(0), atol=0.02)


def test_vlm_with_mask_localizer(rng):
    rgb, pcd, mask = scene(rng)
    vlm = VLM(MaskLocalizer(lambda q: mask))
    point, radius = vlm.get_target_object_world_coords(rgb, pcd, "open_drawer")
    np.testing.assert_allclose(point, [0.2, -0.1, 0.9], atol=0.02)


def test_ground_truth_localizer():
    loc = GroundTruthLocalizer(lambda: np.array([1.0, 2.0, 3.0]), radius=0.25)
    point, radius = loc.locate()
    np.testing.assert_array_equal(point, [1, 2, 3])
    assert radius == 0.25


def test_task_queries():
    assert task_queries("open_jar") == "jar"
    assert task_queries("open_drawer") == "drawer handle"
    assert task_queries("unknown_task") == "object"


def test_owlvit_detector_gates_cleanly():
    from voxactb_tpu.vlm.pipeline import OwlVitSamDetector

    det = OwlVitSamDetector(owlvit_path="/nonexistent", sam_path="/nonexistent")
    with pytest.raises(RuntimeError, match="locally available"):
        det(np.zeros((8, 8, 3), np.uint8), "jar")


def test_color_detector_segments_and_best_guesses(rng):
    from voxactb_tpu.vlm.pipeline import TASK_COLORS, ColorDetector

    det = ColorDetector("open_jar")
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[4:7, 9:12] = TASK_COLORS["open_jar"].astype(np.uint8)
    mask = det(rgb, "jar")
    assert mask.sum() == 9 and mask[5, 10]
    # fully occluded object -> single best-guess pixel (OWL-ViT argmax box
    # semantics), never an exception
    rgb2 = np.full((16, 16, 3), 30, np.uint8)
    rgb2[2, 3] = (120, 40, 40)  # reddish-ish: nearest to the jar color
    mask2 = det(rgb2, "jar")
    assert mask2.sum() >= 1 and mask2[2, 3]


def test_vlm_crop_env_uses_pixels_not_ground_truth():
    """The env's VLM path must latch a pixels-derived crop point once per
    episode (scene_two_robots.py:494 semantics) that tracks the object to a
    few cm without consulting the backend position."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from voxactb_tpu.sim.environment import BimanualTaskEnvironment
    from voxactb_tpu.sim.tasks import TASK_REGISTRY
    from voxactb_tpu.vlm.pipeline import VLM, ColorDetector

    env = BimanualTaskEnvironment(
        TASK_REGISTRY["hand_over_item"], cameras=("wrist", "wrist2"),
        image_size=32, seed=7, vlm=VLM(ColorDetector("hand_over_item")))
    env.reset_to_demo(0)
    gt = env.backend.get_object("cube").position
    est = env.target_object_world_coords()
    assert np.linalg.norm(est - gt) < 0.05
    assert not np.allclose(est, gt)        # pixels-derived, not the GT value
    # latched: moving the cube mid-episode must NOT move the crop point
    env.backend.get_object("cube").position = gt + np.array([0.2, 0.0, 0.0])
    est2 = env.target_object_world_coords()
    np.testing.assert_allclose(est2, est)
