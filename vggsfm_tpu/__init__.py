"""vggsfm_tpu — a TPU-native deep Structure-from-Motion framework.

A from-scratch JAX / XLA / Pallas implementation of an end-to-end deep SfM
pipeline with the capabilities of VGGSfM (CVPR 2024): given a set of images it
predicts camera poses (extrinsics + intrinsics + optional radial distortion),
a sparse 3D point cloud, and writes a COLMAP-format reconstruction.

Design stance (TPU-first):
  * every compute stage is a pure ``(arrays) -> arrays`` function, jit-able,
    with static shapes (padding + validity masks instead of dynamic sizes);
  * RANSAC / LORANSAC are expressed as fixed-budget batched trials
    (vmap + top_k), never data-dependent host loops;
  * bundle adjustment is an in-graph batched Levenberg-Marquardt solver with
    a Schur complement on camera blocks (no CPU Ceres round-trips);
  * multi-chip scaling via `jax.sharding.Mesh` + collectives (see
    ``vggsfm_tpu.parallel``).
"""

__version__ = "0.1.0"
