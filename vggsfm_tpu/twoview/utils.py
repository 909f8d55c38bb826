"""Shared two-view utilities: normalization, Sampson distance, sampling.

Parity targets: vggsfm/two_view_geo/utils.py (generate_samples :39-60,
calculate_residual_indicator :63-87, sampson :90-172, normalize_points_masked
:175-253, cheirality helpers :325-448). Redesigned for TPU:

  * RANSAC minimal-set sampling is a jit-able function of a PRNG key; trials
    whose minimal set contains duplicate indices are *masked invalid* instead
    of rejection-resampled (the reference oversamples 2x on the host and
    filters — a data-dependent shape we cannot afford under jit);
  * residual matrices are never materialized over all candidates at once:
    callers stream candidates in chunks (`lax.map`) and keep per-candidate
    scalar summaries (inlier count / mean inlier residual) — the selection
    indicator needs nothing else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.utils.precision import f32_matmuls

BIG_RESIDUAL = 1e6


def generate_samples(key: jax.Array, n_points: int, num_trials: int,
                     sample_size: int):
    """Random minimal sets: (num_trials, sample_size) indices + validity.

    A trial is invalid if its set contains a repeated index (probability
    ~ sample_size^2 / n for the regimes we run, i.e. rare); invalid trials
    are masked rather than resampled to keep shapes static.
    """
    idx = jax.random.randint(key, (num_trials, sample_size), 0, n_points)
    srt = jnp.sort(idx, axis=-1)
    has_dup = jnp.any(srt[:, 1:] == srt[:, :-1], axis=-1)
    return idx, ~has_dup


def normalize_points_masked(points: jax.Array, masks: jax.Array | None = None,
                            eps: float = 1e-8, colmap_style: bool = False):
    """Hartley normalization of (..., N, 2) points honoring a validity mask.

    Returns (points_norm (..., N, 2), transform (..., 3, 3)) with
    ``points_norm = transform @ [points; 1]``. Masked-out points do not
    influence the mean/scale (parity: utils.py:175-253).
    """
    if masks is None:
        masks = jnp.ones_like(points[..., 0])
    m = masks.astype(points.dtype)[..., None]
    num_valid = jnp.sum(m, axis=-2, keepdims=True)
    mean = jnp.sum(points * m, axis=-2, keepdims=True) / (num_valid + eps)
    diffs = (points - mean) * m
    if colmap_style:
        rms = jnp.sqrt(jnp.sum(diffs**2, axis=(-1, -2)) /
                       (num_valid[..., 0, 0] + eps))
        scale = jnp.sqrt(2.0) / jnp.maximum(rms, eps)
    else:
        mean_dist = jnp.sum(jnp.linalg.norm(diffs, axis=-1), axis=-1) / (
            num_valid[..., 0, 0] + eps)
        scale = jnp.sqrt(2.0) / (mean_dist + eps)

    zero = jnp.zeros_like(scale)
    one = jnp.ones_like(scale)
    transform = jnp.stack([
        scale, zero, -scale * mean[..., 0, 0],
        zero, scale, -scale * mean[..., 0, 1],
        zero, zero, one,
    ], axis=-1).reshape(scale.shape + (3, 3))
    points_norm = (points - mean) * scale[..., None, None]
    return points_norm, transform


@f32_matmuls
def sampson_epipolar_distance(pts1: jax.Array, pts2: jax.Array,
                              Fm: jax.Array, squared: bool = True,
                              eps: float = 1e-8) -> jax.Array:
    """Sampson distance of correspondences under candidate F matrices.

    Args:
      pts1, pts2: (B, N, 2) correspondences.
      Fm: (B, K, 3, 3) candidate fundamental matrices.

    Returns: (B, K, N) distances (squared by default).
    Parity: utils.py:90-172.
    """
    ones = jnp.ones_like(pts1[..., :1])
    p1 = jnp.concatenate([pts1, ones], axis=-1)  # (B,N,3)
    p2 = jnp.concatenate([pts2, ones], axis=-1)

    F_p1 = jnp.einsum("bkij,bnj->bkni", Fm, p1)  # (B,K,N,3)
    Ft_p2 = jnp.einsum("bkji,bnj->bkni", Fm, p2)
    num = jnp.einsum("bni,bkni->bkn", p2, F_p1)  # x2ᵀ F x1

    denom = (F_p1[..., 0] ** 2 + F_p1[..., 1] ** 2 +
             Ft_p2[..., 0] ** 2 + Ft_p2[..., 1] ** 2)
    out = num**2 / (denom + eps)
    if squared:
        return out
    return jnp.sqrt(jnp.maximum(out, 0.0) + eps)


def residual_indicator(inlier_num: jax.Array, inlier_mean_residual: jax.Array,
                       valid: jax.Array | None = None) -> jax.Array:
    """Candidate score: inlier count, tie-broken by mean inlier residual.

    Parity: utils.py:63-87 — indicator = inlier_num + (t - mean)/t with
    t = max(mean) + eps, so the fractional part never reorders counts.
    Invalid candidates score -1.
    """
    mean = jnp.where(inlier_num > 0, inlier_mean_residual, BIG_RESIDUAL)
    thres = jnp.max(mean, axis=-1, keepdims=True) + 1e-6
    frac = (thres - mean) / thres
    score = inlier_num.astype(jnp.float32) + frac.astype(jnp.float32)
    if valid is not None:
        score = jnp.where(valid, score, -1.0)
    return score


@f32_matmuls
def triangulate_point_pair(cam1: jax.Array, cam2: jax.Array,
                           points1: jax.Array, points2: jax.Array) -> jax.Array:
    """Two-view DLT: (B,3,4) x2 cameras, (B,N,2) x2 points -> (B,N,3) world.

    Solved as the smallest eigenvector of the 4x4 normal matrix AᵀA (the
    reference uses cuSOLVER SVD of A; utils.py:366-400).
    """
    from vggsfm_tpu.ops.eigh import smallest_eigenvector

    def rows(cam, pts):  # (B,3,4),(B,N,2) -> (B,N,2,4)
        r0 = pts[..., 0:1] * cam[:, None, 2, :] - cam[:, None, 0, :]
        r1 = pts[..., 1:2] * cam[:, None, 2, :] - cam[:, None, 1, :]
        return jnp.stack([r0, r1], axis=-2)

    A = jnp.concatenate([rows(cam1, points1), rows(cam2, points2)], axis=-2)
    AtA = jnp.einsum("bnri,bnrj->bnij", A, A)
    X = smallest_eigenvector(AtA)  # (B,N,4)
    return X[..., :3] / jnp.where(jnp.abs(X[..., 3:]) < 1e-12,
                                  jnp.sign(X[..., 3:]) + (X[..., 3:] == 0),
                                  X[..., 3:])


def check_cheirality(R: jax.Array, t: jax.Array, points1: jax.Array,
                     points2: jax.Array):
    """Count points with positive bounded depth in both views.

    Args: R (B,3,3), t (B,3), points (B,N,2) *normalized* coords.
    Returns (valid_count (B,), points3D (B,N,3)).
    Parity: utils.py:414-448.
    """
    B = R.shape[0]
    eye34 = jnp.broadcast_to(jnp.eye(3, 4, dtype=R.dtype), (B, 3, 4))
    P2 = jnp.concatenate([R, t[..., None]], axis=-1)

    X = triangulate_point_pair(eye34, P2, points1, points2)
    d1 = X[..., 2]
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    d2 = jnp.einsum("bij,bnj->bni", P2, Xh)[..., 2]

    min_depth = jnp.finfo(R.dtype).eps
    max_depth = 1000.0 * jnp.linalg.norm(
        jnp.einsum("bji,bj->bi", R, t), axis=-1, keepdims=True)
    ok = ((d1 > min_depth) & (d1 < max_depth) &
          (d2 > min_depth) & (d2 < max_depth))
    return jnp.sum(ok, axis=-1), X
