"""VLM object localization driving voxel-grid recentering."""

from voxactb_tpu.vlm.pipeline import (  # noqa: F401
    GroundTruthLocalizer,
    MaskLocalizer,
    VLM,
    crop_point_from_mask,
    task_queries,
)
