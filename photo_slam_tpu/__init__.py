"""photo_slam_tpu — a TPU-native (JAX/XLA/Pallas) real-time photorealistic SLAM framework.

A from-scratch rebuild of the capabilities of Photo-SLAM (CVPR 2024,
HuajianUP/Photo-SLAM): feature-based camera tracking plus online 3D Gaussian
Splatting photorealistic mapping for monocular / stereo / RGB-D cameras —
re-designed for TPU hardware:

  * all splatting compute is JAX/XLA + Pallas (no CUDA, no torch),
  * model state is a functional pytree with static (padded) shapes,
  * densification/pruning are jittable masked compaction ops,
  * multi-chip scaling shards the tile/pixel axis over a jax.sharding.Mesh.

Package layout:
  ops/       differentiable splatting pipeline (preprocess, binning, blend, SH,
             losses, KNN, point transforms) + Pallas kernels
  models/    Gaussian map state, sparse Adam, densify/prune, cameras, keyframes
  mapper/    the online training orchestrator + offline trainer
  io/        COLMAP / dataset readers, PLY, MappingOperation streams
  parallel/  device-mesh sharding of the train/render step
  apps/      CLI entry points mirroring the reference examples/
"""

__version__ = "0.1.0"
