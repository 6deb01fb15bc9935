"""Device-side math ops: voxelization, geometry, SE(3) augmentation, Pallas kernels."""
