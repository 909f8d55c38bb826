"""Homography estimation (4-pt DLT + LORANSAC) and Malis-Vargas decomposition.

Parity: vggsfm/two_view_geo/homography.py:53-418 and the one-way transfer
error in two_view_geo/utils.py:533-581. Disabled on the reference's default
path (`predict_homo=False`, estimate_preliminary.py:108) but part of the
component inventory; the decomposition follows the analytic Malis-Vargas
method, written branch-free (where-selected index cases instead of boolean
row indexing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vggsfm_tpu.ops.eigh import smallest_eigenvector
from vggsfm_tpu.twoview.utils import (
    BIG_RESIDUAL,
    generate_samples,
    normalize_points_masked,
    residual_indicator,
)
from vggsfm_tpu.utils.precision import f32_matmuls


@f32_matmuls
def run_homography_dlt(points1: jax.Array, points2: jax.Array,
                       masks: jax.Array | None = None) -> jax.Array:
    """Masked normalized 4-point DLT: (..., N, 2) x2 -> (..., 3, 3)."""
    if masks is None:
        masks = jnp.ones_like(points1[..., 0])
    p1n, t1 = normalize_points_masked(points1, masks)
    p2n, t2 = normalize_points_masked(points2, masks)
    x1, y1 = p1n[..., 0:1], p1n[..., 1:2]
    x2, y2 = p2n[..., 0:1], p2n[..., 1:2]
    one = jnp.ones_like(x1)
    zero = jnp.zeros_like(x1)
    ax = jnp.concatenate(
        [zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2], axis=-1)
    ay = jnp.concatenate(
        [x1, y1, one, zero, zero, zero, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([ax, ay], axis=-2) * \
        jnp.concatenate([masks, masks], axis=-1)[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    h = smallest_eigenvector(AtA, num_sweeps=8)
    H = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.einsum("...ij,...jk,...kl->...il", jnp.linalg.inv(t2), H, t1)
    return H / jnp.maximum(
        jnp.linalg.norm(H, axis=(-2, -1), keepdims=True), 1e-12)


def oneway_transfer_error(pts1: jax.Array, pts2: jax.Array, H: jax.Array,
                          squared: bool = True, eps: float = 1e-8):
    """||H x1 - x2||^2 per point for candidate H (B, K, 3, 3) -> (B, K, N).

    Parity: two_view_geo/utils.py:533-581.
    """
    ones = jnp.ones_like(pts1[..., :1])
    p1 = jnp.concatenate([pts1, ones], axis=-1)
    Hp = jnp.einsum("bkij,bnj->bkni", H, p1)
    z = Hp[..., 2:]
    z_safe = jnp.where(jnp.abs(z) < eps, eps, z)
    proj = Hp[..., :2] / z_safe
    err = jnp.sum((proj - pts2[:, None]) ** 2, axis=-1)
    err = jnp.where(z[..., 0] <= 0, BIG_RESIDUAL, err)
    if squared:
        return err
    return jnp.sqrt(err + eps)


@partial(jax.jit, static_argnames=("max_ransac_iters", "lo_num"))
def estimate_homography(points1: jax.Array, points2: jax.Array,
                        key: jax.Array, max_ransac_iters: int = 1024,
                        max_error: float = 4.0, lo_num: int = 50,
                        valid_mask: jax.Array | None = None):
    """LORANSAC homography over (B, N, 2) pairs. Returns dict(hmat,
    inlier_num, inlier_mask). Parity: homography.py:53-109."""
    B, N, _ = points1.shape
    thres = max_error**2
    if valid_mask is None:
        valid_mask = jnp.ones((B, N), bool)

    idx, trial_valid = generate_samples(key, N, max_ransac_iters, 4)
    left = jnp.take(points1, idx, axis=1)
    right = jnp.take(points2, idx, axis=1)
    H_cand = run_homography_dlt(left, right)  # (B, R, 3, 3)

    res = oneway_transfer_error(points1, points2, H_cand)
    res = jnp.where(valid_mask[:, None], res, BIG_RESIDUAL)
    res = jnp.where(trial_valid[None, :, None], res, BIG_RESIDUAL)
    inl = res <= thres
    num = jnp.sum(inl, axis=-1)

    _, sel = jax.lax.top_k(num, lo_num)
    inl_sel = jnp.take_along_axis(inl, sel[..., None], axis=1)
    p1_lo = jnp.broadcast_to(points1[:, None], (B, lo_num, N, 2))
    p2_lo = jnp.broadcast_to(points2[:, None], (B, lo_num, N, 2))
    H_lo = run_homography_dlt(p1_lo, p2_lo, inl_sel.astype(points1.dtype))

    H_all = jnp.concatenate([H_cand, H_lo], axis=1)
    res_all = oneway_transfer_error(points1, points2, H_all)
    res_all = jnp.where(valid_mask[:, None], res_all, BIG_RESIDUAL)
    inl_all = res_all <= thres
    num_all = jnp.sum(inl_all, axis=-1)
    mean_all = jnp.sum(jnp.where(inl_all, res_all, 0.0), axis=-1) / \
        jnp.maximum(num_all, 1)

    score = residual_indicator(num_all, mean_all)
    best = jnp.argmax(score, axis=1)
    take = lambda x: jnp.take_along_axis(
        x, best.reshape((B,) + (1,) * (x.ndim - 1)), axis=1)[:, 0]
    return {
        "hmat": take(H_all),
        "inlier_num": take(num_all),
        "inlier_mask": take(inl_all),
    }


def _opposite_minor(S, row: int, col: int):
    col1, col2 = (1 if col == 0 else 0), (1 if col == 2 else 2)
    row1, row2 = (1 if row == 0 else 0), (1 if row == 2 else 2)
    return (S[..., row1, col2] * S[..., row2, col1]
            - S[..., row1, col1] * S[..., row2, col2])


@f32_matmuls
def decompose_homography_matrix(H: jax.Array, K1: jax.Array, K2: jax.Array):
    """Malis-Vargas analytic decomposition -> 4 candidate (R, t, n).

    Args: H (B, 3, 3) pixel-space homographies, K1/K2 (B, 3, 3).
    Returns (R (B, 4, 3, 3), t (B, 4, 3) unit, n (B, 4, 3) plane normals).
    Parity: homography.py:246-418.
    """
    from vggsfm_tpu.ops.svd3 import svd3x3

    Hn = jnp.einsum("bij,bjk,bkl->bil", jnp.linalg.inv(K2), H, K1)
    _, sv, _ = svd3x3(Hn)
    Hn = Hn / jnp.abs(sv[:, 1])[:, None, None]
    det = jnp.linalg.det(Hn)
    Hn = jnp.where(det[:, None, None] < 0, -Hn, Hn)

    eye = jnp.eye(3, dtype=H.dtype)
    S = jnp.einsum("bji,bjk->bik", Hn, Hn) - eye

    M00 = jnp.maximum(_opposite_minor(S, 0, 0), 0.0)
    M11 = jnp.maximum(_opposite_minor(S, 1, 1), 0.0)
    M22 = jnp.maximum(_opposite_minor(S, 2, 2), 0.0)
    rtM00, rtM11, rtM22 = jnp.sqrt(M00), jnp.sqrt(M11), jnp.sqrt(M22)
    e12 = jnp.sign(_opposite_minor(S, 1, 2))
    e02 = jnp.sign(_opposite_minor(S, 0, 2))
    e01 = jnp.sign(_opposite_minor(S, 0, 1))

    absdiag = jnp.stack([jnp.abs(S[:, 0, 0]), jnp.abs(S[:, 1, 1]),
                         jnp.abs(S[:, 2, 2])], axis=1)
    idx = jnp.argmax(absdiag, axis=1)

    # candidate normals for each idx case, then select
    np1_c0 = jnp.stack([S[:, 0, 0], S[:, 0, 1] + rtM22,
                        S[:, 0, 2] + e12 * rtM11], axis=-1)
    np2_c0 = jnp.stack([S[:, 0, 0], S[:, 0, 1] - rtM22,
                        S[:, 0, 2] - e12 * rtM11], axis=-1)
    np1_c1 = jnp.stack([S[:, 0, 1] + rtM22, S[:, 1, 1],
                        S[:, 1, 2] - e02 * rtM00], axis=-1)
    np2_c1 = jnp.stack([S[:, 0, 1] - rtM22, S[:, 1, 1],
                        S[:, 1, 2] + e02 * rtM00], axis=-1)
    np1_c2 = jnp.stack([S[:, 0, 2] + e01 * rtM11, S[:, 1, 2] + rtM00,
                        S[:, 2, 2]], axis=-1)
    np2_c2 = jnp.stack([S[:, 0, 2] - e01 * rtM11, S[:, 1, 2] - rtM00,
                        S[:, 2, 2]], axis=-1)
    sel = jax.nn.one_hot(idx, 3, dtype=H.dtype)[..., None]
    np1 = (sel[:, 0] * np1_c0 + sel[:, 1] * np1_c1 + sel[:, 2] * np1_c2)
    np2 = (sel[:, 0] * np2_c0 + sel[:, 1] * np2_c1 + sel[:, 2] * np2_c2)

    traceS = S[:, 0, 0] + S[:, 1, 1] + S[:, 2, 2]
    v = 2.0 * jnp.sqrt(jnp.maximum(1.0 + traceS - M00 - M11 - M22, 1e-12))

    Sii = jnp.take_along_axis(
        jnp.stack([S[:, 0, 0], S[:, 1, 1], S[:, 2, 2]], axis=1),
        idx[:, None], axis=1)[:, 0]
    ESii = jnp.sign(Sii)
    r = jnp.sqrt(jnp.maximum(2 + traceS + v, 1e-12))
    n_t = jnp.sqrt(jnp.maximum(2 + traceS - v, 1e-12))

    def unit(x):
        nrm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return jnp.where(nrm > 0, x / jnp.maximum(nrm, 1e-12), x)

    np1u, np2u = unit(np1), unit(np2)
    half_nt = 0.5 * n_t
    esii_t_r = ESii * r
    t1_star = half_nt[:, None] * (esii_t_r[:, None] * np2u
                                  - n_t[:, None] * np1u)
    t2_star = half_nt[:, None] * (esii_t_r[:, None] * np1u
                                  - n_t[:, None] * np2u)

    def rot(tstar, n):
        outer = tstar[:, :, None] * n[:, None, :]
        return jnp.einsum("bij,bjk->bik",
                          Hn, eye - (2.0 / v)[:, None, None] * outer)

    R1 = rot(t1_star, np1u)
    R2 = rot(t2_star, np2u)
    t1 = unit(jnp.einsum("bij,bj->bi", R1, t1_star))
    t2 = unit(jnp.einsum("bij,bj->bi", R2, t2_star))

    Rs = jnp.stack([R1, R1, R2, R2], axis=1)
    ts = jnp.stack([t1, -t1, t2, -t2], axis=1)
    ns = jnp.stack([-np1u, np1u, -np2u, np2u], axis=1)
    return Rs, ts, ns
