"""SE3 + scale alignment between camera sets (OpenCV convention), pure JAX.

Used by the incremental video pipeline to stitch each new window's predicted
cameras onto the already-reconstructed trajectory, and by evaluation to align
a prediction to ground truth.

Behavioral parity: reference vggsfm/utils/align.py:145-252
(`align_camera_extrinsics`, `apply_transformation`). The rotation is the
Procrustes solution on the mean rotation covariance; translation + scale come
from matching the camera-frame projections of the translations (a
camera-space Umeyama).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.utils.precision import f32_matmuls


@f32_matmuls
def align_camera_extrinsics(
    cameras_src: jax.Array,
    cameras_tgt: jax.Array,
    estimate_scale: bool = True,
    eps: float = 1e-9,
):
    """Find (R, T, s) with cam_tgt ≈ transform(cam_src).

    Args:
      cameras_src / cameras_tgt: (B, 3, 4) OpenCV [R|t] extrinsics.

    Returns:
      align_R (3, 3), align_T (3,), align_s (scalar) such that
      `apply_transformation(cameras_src, align_R, align_T, align_s)` matches
      `cameras_tgt` when the two sets differ by a world-frame similarity.
    """
    R_src = cameras_src[:, :, :3]
    R_tgt = cameras_tgt[:, :, :3]

    RRcov = jnp.mean(jnp.einsum("bji,bjk->bik", R_tgt, R_src), axis=0)
    # torch.svd returns V (not Vh); align_R = V @ Uᵀ.
    U, _, Vh = jnp.linalg.svd(RRcov)
    align_R = Vh.T @ U.T

    T_src = cameras_src[:, :, 3]
    T_tgt = cameras_tgt[:, :, 3]
    # Project translations into each source camera's world-aligned frame:
    # A_b = T_src_b ᵀ R_src_b,  B_b = T_tgt_b ᵀ R_src_b.
    A = jnp.einsum("bi,bij->bj", T_src, R_src)
    B = jnp.einsum("bi,bij->bj", T_tgt, R_src)

    Amu = jnp.mean(A, axis=0)
    Bmu = jnp.mean(B, axis=0)

    if estimate_scale and cameras_src.shape[0] > 1:
        Ac = A - Amu
        Bc = B - Bmu
        align_s = jnp.mean(Ac * Bc) / jnp.maximum(jnp.mean(Ac**2), eps)
    else:
        align_s = jnp.asarray(1.0, dtype=cameras_src.dtype)

    align_T = Bmu - align_s * Amu
    return align_R, align_T, align_s


@f32_matmuls
def apply_transformation(
    cameras_src: jax.Array,
    align_R: jax.Array,
    align_T: jax.Array,
    align_s: jax.Array,
    return_extri: bool = True,
):
    """Apply a world-frame similarity to (B, 3, 4) extrinsics.

    world' = s * world @ align_Rᵀ + ...: in extrinsic terms
    R' = R @ align_R, t' = R @ align_T + s * t.
    """
    R_src = cameras_src[:, :, :3]
    T_src = cameras_src[:, :, 3]
    aligned_R = R_src @ align_R
    aligned_T = jnp.einsum("bij,j->bi", R_src, align_T) + T_src * align_s
    if return_extri:
        return jnp.concatenate([aligned_R, aligned_T[..., None]], axis=-1)
    return aligned_R, aligned_T
