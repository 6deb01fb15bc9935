"""Object localization -> voxel-grid recentering (the VoxAct-B "VLM" subsystem).

Counterpart of ``VLM`` (RLBench/rlbench/backend/vlm.py:11-196) and its real-robot twin
(vlm_real.py): OWL-ViT proposes a box for a task-specific text query (:77-115), SAM
segments it (:117-143), the mask selects front-camera points whose voxel-downsampled
centroid becomes the crop point, and the crop radius is auto-derived from the object's
extent plus 5cm padding (:144-194).

Decomposition here:
- ``crop_point_from_mask`` — the geometry half (mask + cloud -> centroid + radius),
  detector-agnostic and fully testable without model weights;
- ``Detector`` protocol — anything producing a boolean object mask from an RGB frame:
  ``OwlVitSamDetector`` (transformers-based, requires locally available weights; this
  environment has no network egress so it gates with a clear error),
  ``MaskLocalizer``/``GroundTruthLocalizer`` for sim where ground-truth masks or object
  poses exist;
- ``VLM`` — the user-facing class with the reference's entry point
  ``get_target_object_world_coords``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Protocol, Tuple

import numpy as np

# per-task text queries (vlm.py:146-151)
TASK_QUERIES: Dict[str, str] = {
    "open_jar": "jar",
    "open_drawer": "drawer handle",
    "put_item_in_drawer": "drawer handle",
    "hand_over_item": "item",
}

# failed-jar-detection fallback: the reference's fixed workspace-center crop
# point (vlm.py:177-180), applied only when the detection is implausibly large
JAR_FALLBACK_POINT = np.array([0.27462014, -0.00487481, 0.81258505], np.float32)
JAR_MAX_PLAUSIBLE_DIM = 0.15  # vlm.py:177's bbox>0.15 guard, in meters
AUTO_RADIUS_PADDING = 0.05  # +5cm (vlm.py:182-192)


def task_queries(task_name: str, default: str = "object") -> str:
    return TASK_QUERIES.get(task_name, default)


def voxel_downsample(points: np.ndarray, voxel: float = 0.01) -> np.ndarray:
    """Open3D-style voxel downsample (one mean point per occupied voxel) in numpy.

    Replaces the reference's open3d dependency (vlm.py:160-168).
    """
    if len(points) == 0:
        return points
    keys = np.floor(points / voxel).astype(np.int64)
    _, inverse, counts = np.unique(keys, axis=0, return_inverse=True,
                                   return_counts=True)
    sums = np.zeros((len(counts), 3), np.float64)
    np.add.at(sums, inverse, points)
    return (sums / counts[:, None]).astype(np.float32)


def crop_point_from_mask(
    mask: np.ndarray,
    point_cloud: np.ndarray,
    task_name: str = "",
    downsample_voxel: float = 0.01,
) -> Tuple[np.ndarray, float]:
    """Boolean mask [H,W] + cloud [H,W,3] -> (crop point [3], auto crop radius).

    Mirrors vlm.py:152-194: masked points are voxel-downsampled, the centroid is
    the crop point (OpenJar falls back to the fixed workspace-center point when
    the detection is implausibly large), and the auto radius is the largest
    axis extent of the object plus 5cm padding (vlm.py:182-192).
    """
    pts = point_cloud[mask.astype(bool)].reshape(-1, 3)
    pts = pts[np.isfinite(pts).all(-1)]
    if len(pts) == 0:
        raise ValueError("empty object mask — detector found nothing")
    pts = voxel_downsample(pts, downsample_voxel)

    center = pts.mean(0)
    extents = pts.max(0) - pts.min(0)
    if task_name == "open_jar" and extents[:2].max() > JAR_MAX_PLAUSIBLE_DIM:
        # detector latched onto something jar-sized-ly implausible: fall back
        # to the fixed workspace-center crop point, exactly like the
        # reference's bbox>0.15 guard (vlm.py:177-180) — a GOOD detection
        # keeps its measured centroid, z included
        center = JAR_FALLBACK_POINT.copy()

    radius = float(extents.max() + AUTO_RADIUS_PADDING)
    return center.astype(np.float32), radius


class Detector(Protocol):
    def __call__(self, rgb: np.ndarray, query: str) -> np.ndarray:
        """RGB [H,W,3] uint8 + text query -> boolean mask [H,W]."""


class OwlVitSamDetector:
    """OWL-ViT box proposal + SAM box-prompted mask (vlm.py:77-143).

    Loads transformers checkpoints from ``model_dir`` (local paths only; this
    environment has no network egress). Heavy models load lazily on first call.
    """

    def __init__(self, owlvit_path: str = "google/owlvit-base-patch32",
                 sam_path: str = "facebook/sam-vit-huge",
                 score_threshold: float = 0.1):
        self._owlvit_path = owlvit_path
        self._sam_path = sam_path
        self._score_threshold = score_threshold
        self._models = None

    def _load(self):
        if self._models is not None:
            return
        try:
            from transformers import (
                OwlViTForObjectDetection,
                OwlViTProcessor,
                SamModel,
                SamProcessor,
            )

            self._models = (
                OwlViTProcessor.from_pretrained(self._owlvit_path),
                OwlViTForObjectDetection.from_pretrained(self._owlvit_path),
                SamProcessor.from_pretrained(self._sam_path),
                SamModel.from_pretrained(self._sam_path),
            )
        except Exception as e:  # no weights in a zero-egress environment
            raise RuntimeError(
                "OwlVitSamDetector needs locally available OWL-ViT/SAM weights "
                f"({self._owlvit_path}, {self._sam_path}); use MaskLocalizer or "
                "GroundTruthLocalizer when none exist"
            ) from e

    def __call__(self, rgb: np.ndarray, query: str) -> np.ndarray:
        self._load()
        import torch

        owl_proc, owl, sam_proc, sam = self._models
        inputs = owl_proc(text=[[query]], images=rgb, return_tensors="pt")
        with torch.no_grad():
            out = owl(**inputs)
        h, w = rgb.shape[:2]
        res = owl_proc.post_process_object_detection(
            out, threshold=self._score_threshold,
            target_sizes=torch.tensor([[h, w]]))[0]
        if len(res["scores"]) == 0:
            raise ValueError(f"OWL-ViT found no {query!r}")
        box = res["boxes"][res["scores"].argmax()].tolist()

        sam_in = sam_proc(rgb, input_boxes=[[box]], return_tensors="pt")
        with torch.no_grad():
            sam_out = sam(**sam_in)
        masks = sam_proc.image_processor.post_process_masks(
            sam_out.pred_masks.cpu(), sam_in["original_sizes"].cpu(),
            sam_in["reshaped_input_sizes"].cpu())[0]
        scores = sam_out.iou_scores.reshape(-1)
        return masks[0, int(scores.argmax())].numpy().astype(bool)


class JaxOwlVitSamDetector:
    """TPU-native detector: JAX OWL-ViT box proposal + JAX SAM box-prompted mask.

    The on-device counterpart of :class:`OwlVitSamDetector` — both towers are flax
    modules (models/owlvit.py, models/sam_encoder.py + sam_decoder.py), so the whole
    localization path runs under jit; weights are injected (OpenAI/Meta checkpoints
    map on via the modules' ``load_torch_*`` importers).
    """

    def __init__(self, owl_pipeline, sam_segmenter, score_threshold: float = 0.1):
        self._owl = owl_pipeline
        self._sam = sam_segmenter
        self._threshold = score_threshold
        self._query_cache = {}

    @classmethod
    def from_pretrained(cls, sam_size: str = "vit_h",
                        score_threshold: float = 0.1):
        """Build from locally available checkpoints (utils/pretrained.py hook:
        $VOXACTB_WEIGHTS_DIR with owlvit_base.pt + sam_{size}.pth). Raises
        FileNotFoundError when weights are absent — callers fall back to
        MaskLocalizer / GroundTruthLocalizer, the documented random-init-free
        default on this image."""
        from voxactb_tpu.models.owlvit import OwlViTPipeline
        from voxactb_tpu.models.sam_decoder import (
            SamMaskDecoder,
            SamSegmenter,
            load_torch_sam_decoder_weights,
        )
        from voxactb_tpu.utils import pretrained

        owl = pretrained.load_owlvit()
        sam = pretrained.load_sam_encoder(sam_size)
        if owl is None or sam is None:
            raise FileNotFoundError(
                "no OWL-ViT / SAM checkpoints under "
                f"{pretrained.weights_dir()} (need owlvit_base.pt and "
                f"sam_{sam_size}.pth)")
        (det, det_params), (text, text_params) = owl
        enc, enc_params = sam
        from voxactb_tpu.utils.pretrained import _torch_state_dict, find_weights

        dec_params = load_torch_sam_decoder_weights(
            _torch_state_dict(find_weights(f"sam_{sam_size}")))
        pipeline = OwlViTPipeline(det, det_params, text, text_params)
        segmenter = SamSegmenter(enc, enc_params, SamMaskDecoder(), dec_params)
        return cls(pipeline, segmenter, score_threshold)

    def __call__(self, rgb: np.ndarray, query: str) -> np.ndarray:
        if query not in self._query_cache:
            self._query_cache[query] = self._owl.embed_queries([query])
        box, _score = self._owl.detect(rgb, self._query_cache[query],
                                       self._threshold)
        return self._sam.segment_box(rgb, box)


_BASE = {
    "open_jar": (0.9, 0.1, 0.1),              # jar body (tasks.py OpenJar)
    "open_drawer": (0.8, 0.8, 0.2),           # bottom_handle
    "put_item_in_drawer": (0.8, 0.8, 0.2),    # top_handle
    "hand_over_item": (0.9, 0.2, 0.9),        # cube
}
# nominal object colors per task (sim/tasks.py scene definitions), uint8
TASK_COLORS: Dict[str, np.ndarray] = {
    k: np.array([int(c * 255) for c in v], np.float32)
    for k, v in _BASE.items()
}


class ColorDetector:
    """Pixels-only detector for the renderer's output: segments the task
    object by color distance in the front-camera RGB.

    This is the detector-agnostic slot the reference fills with OWL-ViT+SAM
    (vlm.py:77-143); on the kinematic renderer (flat-shaded colors) a color
    threshold is the equivalent localization signal, and CRUCIALLY the crop
    point still comes from the rendered pixels + depth-derived cloud — so
    perception error (resolution, occlusion, projection, surface-vs-center
    centroid bias) propagates into the policy evaluation exactly as a learned
    detector's would. No ground-truth object position is consulted.
    """

    def __init__(self, task_name: str, tol: float = 40.0):
        if task_name not in TASK_COLORS:
            raise KeyError(f"no nominal color for task {task_name!r}")
        self._color = TASK_COLORS[task_name]
        self._tol = float(tol)

    def __call__(self, rgb: np.ndarray, query: str) -> np.ndarray:
        rgb = np.asarray(rgb, np.float32)
        if rgb.max() <= 1.0 + 1e-6:   # [-1,1]/[0,1] normalized frames
            rgb = (rgb + 1.0) / 2.0 * 255.0 if rgb.min() < 0 else rgb * 255.0
        d = np.linalg.norm(rgb - self._color, axis=-1)
        mask = d < self._tol
        if not mask.any():
            # a fully occluded object still yields a BEST GUESS, like OWL-ViT
            # returning its highest-scoring box regardless of confidence
            # (vlm.py:100-107 argmax over scores) — the guess's error is real
            # perception error and propagates into the eval
            mask = d <= d.min()
        return mask


class MaskLocalizer:
    """Detector backed by ground-truth segmentation masks (sim provides them)."""

    def __init__(self, mask_lookup: Callable[[str], np.ndarray]):
        self._lookup = mask_lookup

    def __call__(self, rgb: np.ndarray, query: str) -> np.ndarray:
        return np.asarray(self._lookup(query), bool)


class GroundTruthLocalizer:
    """Bypasses detection entirely: env supplies the object position directly."""

    def __init__(self, get_position: Callable[[], np.ndarray],
                 radius: float = 0.3):
        self._get_position = get_position
        self._radius = radius

    def locate(self, *_args, **_kw) -> Tuple[np.ndarray, float]:
        return np.asarray(self._get_position(), np.float32), self._radius


class VLM:
    """The reference's entry point: front-camera frame -> crop point + radius
    (vlm.py:144-194)."""

    def __init__(self, detector: Detector, downsample_voxel: float = 0.01):
        self._detector = detector
        self._downsample_voxel = downsample_voxel

    def get_target_object_world_coords(
        self, rgb: np.ndarray, point_cloud: np.ndarray, task_name: str,
        query: Optional[str] = None,
    ) -> Tuple[np.ndarray, float]:
        query = query or task_queries(task_name)
        mask = self._detector(rgb, query)
        return crop_point_from_mask(
            mask, point_cloud, task_name, self._downsample_voxel)
