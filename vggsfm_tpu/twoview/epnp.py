"""Batched Efficient PnP (EPnP) — control-point barycentric absolute pose.

Parity: vggsfm/two_view_geo/perspective_n_points.py:321-437
(`efficient_pnp`, Moreno-Noguer et al., IJCV 2009), the reference's
LORANSAC local-refinement solver for absolute pose (two_view_geo/pnp.py:140).

TPU redesign notes (same math, different mechanics):
  * barycentric coordinates are closed-form: with control points
    c_i = e_i + mean (i=1..3), c_4 = mean, the alphas are simply
    [x - mean, 1 - sum(x - mean)] — no batched 4x4 inverse;
  * the control-point pairwise distances are the CONSTANT vector
    [2, 2, 1, 2, 1, 1] (unit-axis control points), precomputed;
  * the 12x12 nullspace comes from the batched Jacobi eigh
    (vggsfm_tpu.ops.eigh) instead of cuSOLVER, and the beta
    least-squares subproblems (6 x k, k <= 5) solve via ridge-stabilized
    normal equations instead of `torch.pinverse`;
  * the weighted Umeyama (scale + rotation alignment,
    pytorch3d corresponding_points_alignment) uses the closed-form
    `ops.svd3x3` (proper rotations, signed smallest singular value).

Everything batches over arbitrary leading axes and is jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.ops.eigh import eigh_small
from vggsfm_tpu.ops.svd3 import svd3x3
from vggsfm_tpu.utils.precision import f32_matmuls

# squared pairwise distances between the 4 control points
# c_i = e_i + m (i = 1..3), c_4 = m, combination order
# (0,1) (0,2) (0,3) (1,2) (1,3) (2,3)
_CW_DST = jnp.asarray([2.0, 2.0, 1.0, 2.0, 1.0, 1.0], jnp.float32)
# column indices into the quadratic-term layout
# [B11 B22 B33 B44 B12 B13 B14 B23 B24 B34]
_CASE_COLS = ((0, 4, 5, 6), (0, 4, 1), (0, 4, 1, 5, 7))
_PAIRS4 = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _wmean(x, w):
    """Weighted mean over the points axis: x (..., P, D), w (..., P)."""
    num = jnp.sum(x * w[..., None], axis=-2)
    return num / jnp.maximum(jnp.sum(w, axis=-1)[..., None], 1e-9)


def _umeyama(X, Y, w):
    """Weighted similarity alignment: find (s, R, T) with s*X@R + T ~= Y.

    X, Y: (..., P, 3); w: (..., P). Row-vector convention (the transform
    right-multiplies), matching pytorch3d corresponding_points_alignment
    with estimate_scale=True. Returns (R (...,3,3), T (...,3), s (...,)).
    """
    Xm = _wmean(X, w)
    Ym = _wmean(Y, w)
    Xc = X - Xm[..., None, :]
    Yc = Y - Ym[..., None, :]
    M = jnp.einsum("...pi,...p,...pj->...ij", Xc, w, Yc)  # (..., 3, 3)
    U, S, V = svd3x3(M)
    R = jnp.einsum("...ik,...jk->...ij", U, V)  # U @ V^T, det=+1
    xvar = jnp.sum(w[..., None] * Xc * Xc, axis=(-1, -2))
    s = jnp.sum(S, axis=-1) / jnp.maximum(xvar, 1e-12)
    T = Ym - s[..., None] * jnp.einsum("...i,...ij->...j", Xm, R)
    return R, T, s


def _solve_case(kernel_dsts, cols, ridge=1e-9):
    """Least-squares for selected quadratic-term columns.

    kernel_dsts: (..., 6, 10). Returns beta (..., k) solving
    kernel_dsts[..., cols] @ beta ~= _CW_DST via normal equations.
    """
    A = kernel_dsts[..., cols]  # (..., 6, k)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    Atb = jnp.einsum("...ni,n->...i", A, _CW_DST)
    k = len(cols)
    AtA = AtA + ridge * jnp.eye(k, dtype=A.dtype)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]


def _bsign(t):
    return jnp.where(t >= 0, 1.0, -1.0).astype(t.dtype)


def _coords_case1(beta, eps=1e-9):
    """[B11 B12 B13 B14] -> all four coords scaled by 1/sqrt(B11)."""
    beta = beta * _bsign(beta[..., :1])
    return beta / jnp.maximum(jnp.sqrt(beta[..., :1]), eps)


def _coords_case2(beta):
    """[B11 B12 B22] -> [sqrt|B11|*sign(B12), gated sqrt|B22|, 0, 0]."""
    c0 = jnp.sqrt(jnp.abs(beta[..., 0])) * _bsign(beta[..., 1])
    same = ((beta[..., 0] >= 0) == (beta[..., 2] >= 0)).astype(beta.dtype)
    c1 = jnp.sqrt(jnp.abs(beta[..., 2])) * same
    z = jnp.zeros_like(c0)
    return jnp.stack([c0, c1, z, z], axis=-1)


def _coords_case3(beta, eps=1e-9):
    """[B11 B12 B22 B13 B23] -> [c0, c1, B13/c0, 0]."""
    c0 = jnp.sqrt(jnp.abs(beta[..., 0])) * _bsign(beta[..., 1])
    same = ((beta[..., 0] >= 0) == (beta[..., 2] >= 0)).astype(beta.dtype)
    c1 = jnp.sqrt(jnp.abs(beta[..., 2])) * same
    c2 = beta[..., 3] / jnp.where(jnp.abs(c0) < eps, eps, c0)
    return jnp.stack([c0, c1, c2, jnp.zeros_like(c0)], axis=-1)


def _score_candidate(c_cam, alphas, x_world, y, w):
    """Scale/flip-resolve one control-point candidate and score it.

    c_cam: (..., 4, 3) control points in camera coordinates (up to
    scale/sign). Returns (R, T, err_2d) in ROW-VECTOR convention
    (x_world @ R + T ~ camera coords), like the reference's EpnpSolution.
    """
    x_cam = jnp.einsum("...pk,...kj->...pj", alphas, c_cam)  # (..., P, 3)
    # resolve the global sign: weighted-mean depth must be positive
    zmean = _wmean(x_cam[..., 2:], w)[..., 0]
    x_cam = x_cam * jnp.where(zmean < 0, -1.0, 1.0)[..., None, None]

    R, T, s = _umeyama(x_world, x_cam, w)
    s = jnp.maximum(s, 1e-9)
    T = T / s[..., None]
    x_rot = jnp.einsum("...pi,...ij->...pj", x_world, R) + T[..., None, :]

    z = jnp.maximum(x_rot[..., 2:], 1e-9)
    proj = x_rot[..., :2] / z
    dist = jnp.sqrt(jnp.sum((y - proj) ** 2, axis=-1))
    err_2d = jnp.sum(dist * w, axis=-1) / jnp.maximum(
        jnp.sum(w, axis=-1), 1e-9)
    return R, T, err_2d


@f32_matmuls
def efficient_pnp(x: jax.Array, y: jax.Array,
                  weights: jax.Array | None = None,
                  num_sweeps: int = 12):
    """EPnP absolute pose, batched over arbitrary leading axes.

    Args:
      x: (..., P, 3) world points.
      y: (..., P, 2) NORMALIZED (intrinsics-free) image points.
      weights: optional (..., P) non-negative weights / inlier mask.

    Returns dict with ``extrinsics (..., 3, 4)`` (world->cam,
    column-vector convention: Xc = R @ Xw + t) and ``err_2d (...,)``
    (weighted mean normalized reprojection distance of the winning
    candidate). Four candidates (raw kernel + 3 quadratic beta cases) are
    scored by reprojection error; the best wins, per batch element.
    """
    P = x.shape[-2]
    lead = x.shape[:-2]
    w = (jnp.ones(lead + (P,), x.dtype) if weights is None
         else weights.astype(x.dtype))

    m = _wmean(x, w)  # (..., 3)
    a123 = x - m[..., None, :]
    alphas = jnp.concatenate(
        [a123, 1.0 - jnp.sum(a123, axis=-1, keepdims=True)], axis=-1)
    aw = alphas * w[..., None]  # weighted alphas (reference _build_M)

    # M rows: per point, u-row has per-control-point coeffs (1, 0, -u),
    # v-row (0, 1, -v); unknown layout (4 control points) x (x, y, z).
    u = y[..., 0:1]
    v = y[..., 1:2]
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    cu = jnp.stack([one, zero, -u], axis=-1)[..., 0, :]  # (..., P, 3)
    cv = jnp.stack([zero, one, -v], axis=-1)[..., 0, :]
    # (..., P, 12) rows: alpha_j * coeff -> MtM accumulated directly
    Mu = (aw[..., :, None] * cu[..., None, :]).reshape(lead + (P, 12))
    Mv = (aw[..., :, None] * cv[..., None, :]).reshape(lead + (P, 12))
    MtM = (jnp.einsum("...pi,...pj->...ij", Mu, Mu)
           + jnp.einsum("...pi,...pj->...ij", Mv, Mv))

    _, V = eigh_small(MtM, num_sweeps=num_sweeps, sort=True)  # ascending
    kernel = V[..., :4]  # (..., 12, 4) smallest-4 eigenvectors in columns
    kernel = kernel.reshape(lead + (4, 3, 4))  # (..., ctrl, xyz, D)

    # pairwise differences of kernel vectors across control points
    dv = jnp.stack([kernel[..., i, :, :] - kernel[..., j, :, :]
                    for i, j in _PAIRS4], axis=-3)  # (..., 6, 3, D)
    rows_ii = jnp.sum(dv * dv, axis=-2)  # (..., 6, D)
    rows_2ij = 2.0 * jnp.stack(
        [jnp.sum(dv[..., i] * dv[..., j], axis=-1) for i, j in _PAIRS4],
        axis=-1)  # (..., 6, 6)
    kernel_dsts = jnp.concatenate([rows_ii, rows_2ij], axis=-1)

    coords = [
        _coords_case1(_solve_case(kernel_dsts, _CASE_COLS[0])),
        _coords_case2(_solve_case(kernel_dsts, _CASE_COLS[1])),
        _coords_case3(_solve_case(kernel_dsts, _CASE_COLS[2])),
    ]
    cands = [kernel[..., 0]] + [
        jnp.einsum("...ijd,...d->...ij", kernel, c) for c in coords]

    Rs, Ts, errs = [], [], []
    for c_cam in cands:
        R, T, e = _score_candidate(c_cam, alphas, x, y, w)
        Rs.append(R)
        Ts.append(T)
        errs.append(e)
    err = jnp.stack(errs, axis=-1)  # (..., 4)
    best = jnp.argmin(err, axis=-1)
    Rbest = jnp.take_along_axis(
        jnp.stack(Rs, axis=-3), best[..., None, None, None], axis=-3
    )[..., 0, :, :]
    Tbest = jnp.take_along_axis(
        jnp.stack(Ts, axis=-2), best[..., None, None], axis=-2)[..., 0, :]
    err_best = jnp.take_along_axis(err, best[..., None], axis=-1)[..., 0]

    # row-vector (x @ R + T) -> standard column-vector extrinsic [R^T | T]
    extr = jnp.concatenate(
        [jnp.swapaxes(Rbest, -1, -2), Tbest[..., None]], axis=-1)
    return {"extrinsics": extr, "err_2d": err_best}
