"""ct_icp_tpu — a TPU-native continuous-time LiDAR SLAM engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of the CT-ICP reference
(jedeschaud/ct_icp): elastic LiDAR odometry with per-point timestamps, a
multi-resolution voxel local map with fixed-radius neighbor search, and a
batched Gauss-Newton/Levenberg-Marquardt continuous-time registration solver —
all expressed as fixed-shape, masked array programs that XLA compiles for TPU,
plus a scale-out layer (sharded maps + distributed continuous-time bundle
adjustment over `jax.lax` collectives) that the CPU reference does not have.

Layout:
  core/        SE3/pose math (device f32 + host f64 instances of one impl)
  config/      options dataclasses + YAML config surface + profiles
  ops/         preprocessing kernels: voxel hashing, subsampling, 3x3 eigen
  mapping/     the multi-resolution voxel hash map as device arrays
  icp/         residuals, robust losses, the batched CT-GN/LM solver
  odometry/    host-side odometry pipeline (motion init, robust regimen, map update)
  datasets/    KITTI/KITTI-360/KITTI-CARLA/NCLT/PLY-directory/synthetic readers
  evaluation/  KITTI RPE/APE metrics
  parallel/    device-mesh sharding + distributed CT bundle adjustment
  io/          PLY + trajectory/pose file formats
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("CT_FORCE_CPU"):
    # Honor CT_FORCE_CPU for EVERY entry point (cli, regression, convert,
    # tools, bare library use). Some environments register a remote
    # accelerator PJRT plugin from sitecustomize and force jax_platforms
    # there, clobbering a shell-level JAX_PLATFORMS=cpu; updating the
    # config directly (before any backend initialization) wins.
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
