"""voxactb_tpu — a TPU-native JAX/XLA/Pallas framework with the capabilities of VoxAct-B.

VoxAct-B (CoRL 2024) is a language-conditioned, voxel-based acting-and-stabilizing policy
stack for bimanual manipulation. This package rebuilds its perception-to-action pipeline
TPU-first:

- ``ops``      — device math: voxel scatter-mean encoder, SE(3) augmentation, geometry,
                 Pallas kernels for the hot paths.
- ``models``   — flax modules: PerceiverVoxelLangEncoder (+ two-robot variant), CLIP-RN50
                 text encoder, network blocks.
- ``agents``   — the Agent API (act/update) with fully-jitted inference and train steps.
- ``parallel`` — jax.sharding Mesh construction and sharded train/eval programs.
- ``replay``   — host-side replay buffers and demo ingestion feeding device shards.
- ``runners``  — offline train runner, eval/rollout orchestration.
- ``envs``     — environment adapters (fake bimanual env for tests; RLBench bridge).
- ``vlm``      — object localization (OWL-ViT/SAM interfaces) driving voxel-grid recentering.
- ``voxposer`` — LLM-planner subsystem (value maps, greedy planner, controller).
- ``utils``    — keypoint discovery, observation extraction, logging, checkpointing.

The reference implementation analyzed in SURVEY.md lives at /root/reference (PyTorch/CUDA);
this package is a ground-up JAX redesign, not a port. Reference citations in docstrings
(file:line) are for behavioral parity checking only.
"""

__version__ = "0.1.0"
