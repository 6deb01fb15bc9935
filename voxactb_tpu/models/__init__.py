"""Flax model zoo: Perceiver voxel Q-nets, CLIP text encoder, network blocks."""
