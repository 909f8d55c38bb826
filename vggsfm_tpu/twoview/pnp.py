"""Absolute pose (PnP) by batched DLT + LORANSAC with focal grid search.

Parity: vggsfm/two_view_geo/pnp.py:38-231 (`conduct_pnp`,
`generate_focal_factors`) — COLMAP's focal-sweep absolute pose estimation
re-expressed with fixed budgets. Differences by design:

  * the minimal solver is a 6-point DLT whose nullspace comes from the
    12x12 normal-matrix eigensolve (no kornia), with the rotation factor
    projected to SO(3) via the eigh-based 3x3 SVD;
  * local refinement re-runs the same DLT over each candidate's inlier set
    (mask-weighted). The reference refines with ePnP
    (perspective_n_points.py); masked DLT is the TPU-native equivalent here
    since downstream BA polishes the pose either way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.ops.eigh import smallest_eigenvector
from vggsfm_tpu.ops.svd3 import svd3x3
from vggsfm_tpu.twoview.utils import (
    BIG_RESIDUAL,
    generate_samples,
    residual_indicator,
)
from vggsfm_tpu.utils.precision import f32_matmuls


def generate_focal_factors(num_samples: int = 50,
                           max_ratio: float = 5.0,
                           min_ratio: float = 0.2) -> np.ndarray:
    """COLMAP's quadratic focal sweep (pnp.py:216-231)."""
    out = []
    fstep = 1.0 / num_samples
    fscale = max_ratio - min_ratio
    focal = 0.0
    for _ in range(num_samples):
        out.append(min_ratio + fscale * focal * focal)
        focal += fstep
    out.append(1.0)
    return np.asarray(out, np.float32)


def _dlt_normal_matrix(points3D, points2D_norm, weights):
    """Accumulate the 12x12 DLT normal matrix AᵀA for one point block."""
    ones = jnp.ones_like(points3D[..., :1])
    Xh = jnp.concatenate([points3D, ones], axis=-1)  # (..., P, 4)
    u = points2D_norm[..., 0:1]
    v = points2D_norm[..., 1:2]
    zero = jnp.zeros_like(Xh)
    # rows: [X 0 -uX ; 0 X -vX] for P = [p1;p2;p3]
    r1 = jnp.concatenate([Xh, zero, -u * Xh], axis=-1)  # (..., P, 12)
    r2 = jnp.concatenate([zero, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2P, 12)
    if weights is not None:
        w = jnp.concatenate([weights, weights], axis=-1)[..., None]
        A = A * w
    return jnp.einsum("...ni,...nj->...ij", A, A)


@f32_matmuls
def solve_pnp_dlt(points3D: jax.Array, points2D_norm: jax.Array,
                  weights: jax.Array | None = None,
                  point_chunk: int | None = None) -> jax.Array:
    """DLT absolute pose from >= 6 correspondences, batched.

    Args:
      points3D: (..., P, 3) world points.
      points2D_norm: (..., P, 2) *normalized* (K-free) image points.
      weights: optional (..., P) mask/weights.
      point_chunk: stream the AᵀA accumulation over point blocks of this
        size — bounds peak memory to one block's (..., 2*chunk, 12) design
        matrix instead of the full point set's.

    Returns (..., 3, 4) world->cam with R projected to SO(3) and
    translation rescaled consistently.
    """
    P = points3D.shape[-2]
    if point_chunk is not None and P > point_chunk:
        n_c = -(-P // point_chunk)
        pad = n_c * point_chunk - P
        w_full = (jnp.ones(points3D.shape[:-1], points3D.dtype)
                  if weights is None else weights)

        def pad_pts(x):
            widths = [(0, 0)] * (x.ndim - 2) + [(0, pad), (0, 0)]
            return jnp.pad(x, widths)

        p3p = pad_pts(points3D)
        p2p = pad_pts(points2D_norm)
        wp = jnp.pad(w_full, [(0, 0)] * (w_full.ndim - 1) + [(0, pad)])

        def split(x):  # (..., n_c*Pc, d) -> (n_c, ..., Pc, d)
            y = x.reshape(x.shape[:-2] + (n_c, point_chunk, x.shape[-1]))
            return jnp.moveaxis(y, -3, 0)

        wsplit = jnp.moveaxis(
            wp.reshape(wp.shape[:-1] + (n_c, point_chunk)), -2, 0)
        AtA = jnp.sum(jax.lax.map(
            lambda a: _dlt_normal_matrix(*a),
            (split(p3p), split(p2p), wsplit)), axis=0)
    else:
        AtA = _dlt_normal_matrix(points3D, points2D_norm, weights)
    p = smallest_eigenvector(AtA, num_sweeps=10)  # (..., 12)
    P_mat = p.reshape(p.shape[:-1] + (3, 4))

    # the nullspace sign is arbitrary: resolve by cheirality — the majority
    # of (weighted) points must land at positive depth
    Xh = jnp.concatenate([points3D, jnp.ones_like(points3D[..., :1])],
                         axis=-1)
    z = jnp.einsum("...j,...pj->...p", P_mat[..., 2, :], Xh)
    zsign = jnp.sign(z)
    if weights is not None:
        zsign = zsign * weights
    flip = jnp.where(jnp.sum(zsign, axis=-1) < 0, -1.0, 1.0)
    P_mat = P_mat * flip[..., None, None]

    R_raw = P_mat[..., :3]
    t_raw = P_mat[..., 3]
    U, S, V = svd3x3(R_raw)
    # nearest rotation (det(UVᵀ) = +1 by svd3x3 construction); the DLT
    # scale gauge is the mean singular value
    scale = jnp.maximum(jnp.mean(S, axis=-1, keepdims=True), 1e-12)
    R = jnp.einsum("...ij,...kj->...ik", U, V)
    t = t_raw / scale
    return jnp.concatenate([R, t[..., None]], axis=-1)


def _reproj_residuals(extrinsic, points3D, points2D_norm):
    """(..., 3, 4) x (..., P, 3) -> squared normalized reprojection (..., P),
    cheirality failures pushed to BIG_RESIDUAL."""
    Xc = jnp.einsum("...ij,...pj->...pi", extrinsic[..., :3], points3D) \
        + extrinsic[..., None, :, 3]
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    proj = Xc[..., :2] / z_safe[..., None]
    res = jnp.sum((proj - points2D_norm) ** 2, axis=-1)
    return jnp.where(z <= 0, BIG_RESIDUAL, res)


@partial(jax.jit, static_argnames=("max_ransac_iters", "lo_num", "f_trials",
                                   "refine"))
def absolute_pose_ransac(
    points3D: jax.Array,
    points2D: jax.Array,
    intrinsics: jax.Array,
    key: jax.Array,
    valid_mask: jax.Array | None = None,
    max_error: float = 8.0,
    max_ransac_iters: int = 256,
    lo_num: int = 32,
    f_trials: int = 17,
    refine: str = "dlt",
):
    """LORANSAC PnP with focal sweep over batched frames.

    Args:
      points3D: (B, P, 3); points2D: (B, P, 2) pixels; intrinsics (B, 3, 3).
      valid_mask: optional (B, P).
      refine: local-refinement solver over each candidate's inlier set —
        'dlt' (mask-weighted 6-point DLT re-solve) or 'epnp' (the
        reference's EPnP control-point refinement,
        two_view_geo/pnp.py:140 + perspective_n_points.py:321-437).

    Returns dict ``extrinsics (B,3,4)``, ``intrinsics (B,3,3)``,
    ``inlier_num (B,)``, ``inlier_mask (B,P)``.
    """
    B, P, _ = points3D.shape
    fl = jnp.stack([intrinsics[:, 0, 0], intrinsics[:, 1, 1]], axis=-1)
    pp = intrinsics[:, :2, 2]
    if valid_mask is None:
        valid_mask = jnp.ones((B, P), bool)

    factors = jnp.asarray(generate_focal_factors(f_trials - 1)) \
        if f_trials > 1 else jnp.ones((1,), jnp.float32)
    F = factors.shape[0]

    # normalized 2D per focal factor: (B, F, P, 2)
    p2n = (points2D - pp[:, None]) / fl[:, None]
    p2n = p2n[:, None] / factors[None, :, None, None]
    p3 = jnp.broadcast_to(points3D[:, None], (B, F, P, 3))
    vmask = jnp.broadcast_to(valid_mask[:, None], (B, F, P))

    max_thres = (max_error / jnp.maximum(fl.mean(-1), 1e-6)) ** 2  # (B,)
    thres_bf = (max_thres[:, None] / factors[None, :] ** 2).reshape(B * F)

    p3f = p3.reshape(B * F, P, 3)
    p2f = p2n.reshape(B * F, P, 2)
    vf = vmask.reshape(B * F, P)

    sample_idx, trial_valid = generate_samples(key, P, max_ransac_iters, 6)
    p3_s = jnp.take(p3f, sample_idx, axis=1)  # (BF, R, 6, 3)
    p2_s = jnp.take(p2f, sample_idx, axis=1)
    pose_cand = solve_pnp_dlt(p3_s, p2_s)  # (BF, R, 3, 4)

    # counting pass streamed over trial chunks: materializing the full
    # (BF, R, P, 3) camera-space tensor OOMs at production sizes (observed
    # 12.75 GB at BF=136, R=256, P=32768 on a 16 GB chip); only the
    # per-trial inlier COUNT is needed before top-k, so stream it
    trial_chunk = min(32, max_ransac_iters)
    n_tc = -(-max_ransac_iters // trial_chunk)
    pad_r = n_tc * trial_chunk - max_ransac_iters
    pose_pad = jnp.pad(pose_cand, ((0, 0), (0, pad_r), (0, 0), (0, 0)))
    tv_pad = jnp.pad(trial_valid, (0, pad_r))
    pose_ch = jnp.moveaxis(
        pose_pad.reshape(B * F, n_tc, trial_chunk, 3, 4), 1, 0)
    tv_ch = tv_pad.reshape(n_tc, trial_chunk)

    def _count(args):
        pose_c, tv_c = args
        r = _reproj_residuals(pose_c, p3f[:, None], p2f[:, None])
        r = jnp.where(vf[:, None], r, BIG_RESIDUAL)
        r = jnp.where(tv_c[None, :, None], r, BIG_RESIDUAL)
        return jnp.sum(r <= thres_bf[:, None, None], axis=-1)

    num = jnp.moveaxis(jax.lax.map(_count, (pose_ch, tv_ch)),
                       0, 1).reshape(B * F, n_tc * trial_chunk)
    num = num[:, :max_ransac_iters]  # (BF, R)

    _, sel = jax.lax.top_k(num, lo_num)
    # recompute inliers only for the selected candidates (BF, lo, P)
    pose_sel = jnp.take_along_axis(
        pose_cand, sel[..., None, None], axis=1)
    res_sel = _reproj_residuals(pose_sel, p3f[:, None], p2f[:, None])
    res_sel = jnp.where(vf[:, None], res_sel, BIG_RESIDUAL)
    tv_sel = jnp.take_along_axis(
        jnp.broadcast_to(trial_valid[None], (B * F, max_ransac_iters)),
        sel, axis=1)
    res_sel = jnp.where(tv_sel[..., None], res_sel, BIG_RESIDUAL)
    inl_sel = res_sel <= thres_bf[:, None, None]  # (BF, lo, P)

    p3_lo = jnp.broadcast_to(p3f[:, None], (B * F, lo_num, P, 3))
    p2_lo = jnp.broadcast_to(p2f[:, None], (B * F, lo_num, P, 2))
    if refine == "epnp":
        from vggsfm_tpu.twoview.epnp import efficient_pnp

        pose_lo = efficient_pnp(
            p3_lo, p2_lo, weights=inl_sel.astype(p3f.dtype))["extrinsics"]
    elif refine == "dlt":
        pose_lo = solve_pnp_dlt(p3_lo, p2_lo, inl_sel.astype(p3f.dtype),
                                point_chunk=2048)
    else:
        raise ValueError(f"unknown PnP refine mode {refine!r}")

    res_lo = _reproj_residuals(pose_lo, p3f[:, None], p2f[:, None])
    res_lo = jnp.where(vf[:, None], res_lo, BIG_RESIDUAL)
    inl_lo = res_lo <= thres_bf[:, None, None]
    num_lo = jnp.sum(inl_lo, axis=-1)
    mean_lo = jnp.sum(jnp.where(inl_lo, res_lo, 0.0), axis=-1) / \
        jnp.maximum(num_lo, 1)

    # fold focal trials into the candidate axis per original frame
    poses = pose_lo.reshape(B, F * lo_num, 3, 4)
    nums = num_lo.reshape(B, F * lo_num)
    means = mean_lo.reshape(B, F * lo_num)
    intr_cand = jnp.broadcast_to(intrinsics[:, None],
                                 (B, F, 3, 3)).copy()
    intr_cand = intr_cand.at[:, :, 0, 0].mul(factors[None, :])
    intr_cand = intr_cand.at[:, :, 1, 1].mul(factors[None, :])
    intr_all = jnp.repeat(intr_cand, lo_num, axis=1)

    score = residual_indicator(nums, means)
    best = jnp.argmax(score, axis=1)
    best_pose = jnp.take_along_axis(poses, best[:, None, None, None],
                                    axis=1)[:, 0]
    best_intr = jnp.take_along_axis(intr_all, best[:, None, None, None],
                                    axis=1)[:, 0]
    inl_all = inl_lo.reshape(B, F * lo_num, P)
    best_inl = jnp.take_along_axis(inl_all, best[:, None, None],
                                   axis=1)[:, 0]
    return {
        "extrinsics": best_pose,
        "intrinsics": best_intr,
        "inlier_num": jnp.sum(best_inl, axis=-1),
        "inlier_mask": best_inl,
    }
