"""Camera pose evaluation metrics (pure JAX).

Relative rotation / translation angular errors over all camera pairs and the
AUC@τ aggregation used by the IMC benchmark.

Behavioral parity: reference vggsfm/utils/metric.py:107-218
(`camera_to_rel_deg`, `calculate_auc`), :305-332 (`rotation_angle`,
`translation_angle`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.geometry.rotations import so3_geodesic_angle
from vggsfm_tpu.geometry.cameras import se3_inverse, se3_compose

from vggsfm_tpu.utils.precision import f32_matmuls


def rotation_angle_deg(R1: jax.Array, R2: jax.Array) -> jax.Array:
    """Geodesic angle between batched rotations, in degrees."""
    return so3_geodesic_angle(R1, R2) * (180.0 / jnp.pi)


def translation_angle_deg(
    t1: jax.Array, t2: jax.Array, eps: float = 1e-15, ambiguity: bool = True
) -> jax.Array:
    """Angle between translation directions (degrees), with sign ambiguity.

    Parity: metric.py:321-332 — relative translation is only defined up to
    sign for an essential-matrix-style comparison, so take min(θ, 180°-θ).
    """
    n1 = jnp.linalg.norm(t1, axis=-1)
    n2 = jnp.linalg.norm(t2, axis=-1)
    cos = jnp.sum(t1 * t2, axis=-1) / jnp.maximum(n1 * n2, eps)
    ang = jnp.arccos(jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7))
    deg = ang * (180.0 / jnp.pi)
    if ambiguity:
        deg = jnp.minimum(deg, 180.0 - deg)
    return deg


def _pair_indices(S: int):
    idx = jnp.arange(S)
    i, j = jnp.meshgrid(idx, idx, indexing="ij")
    mask = i < j
    return i, j, mask


@f32_matmuls
def relative_pose_errors(
    pred_extrinsics: jax.Array, gt_extrinsics: jax.Array
):
    """Pairwise relative rotation/translation errors (degrees).

    Args:
      pred_extrinsics / gt_extrinsics: (S, 3, 4) OpenCV world->cam.

    Returns:
      (rot_err_deg, trans_err_deg): each flat over the C(S,2) unordered pairs
      (returned as (S*S,) with a boolean mask), plus the pair mask.

    Parity: metric.py:107-151 (`camera_to_rel_deg`), which forms
    rel_ij = extr_j ∘ extr_i⁻¹ for both sets and compares angles.
    """
    S = pred_extrinsics.shape[0]
    i, j, mask = _pair_indices(S)
    i = i.reshape(-1)
    j = j.reshape(-1)
    mask = mask.reshape(-1)

    def rel(extr):
        inv_i = se3_inverse(extr[i])
        return se3_compose(extr[j], inv_i)

    rel_pred = rel(pred_extrinsics)
    rel_gt = rel(gt_extrinsics)

    rot_err = rotation_angle_deg(rel_pred[..., :3, :3], rel_gt[..., :3, :3])
    trans_err = translation_angle_deg(rel_pred[..., :3, 3], rel_gt[..., :3, 3])
    return rot_err, trans_err, mask


def calculate_auc(
    r_error: jax.Array,
    t_error: jax.Array,
    mask: jax.Array | None = None,
    max_threshold: int = 30,
) -> jax.Array:
    """AUC of the pose accuracy curve at integer thresholds 1..max_threshold.

    Parity: metric.py:154-218 — error per pair is max(rot, trans); the curve
    is the normalized histogram cumsum over [0, max_threshold) degrees.
    """
    err = jnp.maximum(r_error, t_error)
    if mask is not None:
        # Ignore padded pairs by pushing them past the last bin.
        err = jnp.where(mask, err, jnp.inf)
        n = jnp.sum(mask)
    else:
        n = err.shape[0]
    bins = jnp.arange(max_threshold + 1, dtype=err.dtype)
    hist = jnp.sum(
        (err[None, :] >= bins[:-1, None]) & (err[None, :] < bins[1:, None]),
        axis=-1,
    ).astype(err.dtype)
    normalized = hist / jnp.maximum(n, 1)
    return jnp.mean(jnp.cumsum(normalized))


def pose_auc30(pred_extrinsics: jax.Array, gt_extrinsics: jax.Array):
    """End-to-end AUC@30 between two camera sets (after any alignment)."""
    r_err, t_err, mask = relative_pose_errors(pred_extrinsics, gt_extrinsics)
    return calculate_auc(r_err, t_err, mask=mask, max_threshold=30)
