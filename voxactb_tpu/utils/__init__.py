"""Host-side utilities: observation extraction, keypoints, logging, checkpoints."""
