"""Command-line entry points: python -m voxactb_tpu.cli.train / .eval / .dataset"""
