"""Batched 7pt/8pt fundamental-matrix estimation with streaming LORANSAC.

Reference behavior: vggsfm/two_view_geo/fundamental.py:43-183 (LORANSAC
driver), :254-333 (masked normalized 8-point DLT + rank-2 projection),
:341-469 (7-point cubic solver). TPU redesign:

  * the nullspaces come from the batched Jacobi eigensolver on the 9x9
    normal matrix AᵀA (`vggsfm_tpu.ops.eigh`) — no cuSOLVER SVD, no batch
    caps, everything fuses into one XLA computation;
  * the cubic det constraint of the 7-point solver is expanded by
    multilinearity of det over columns (no 3x3 inverses, unlike the
    reference's `tr(f2 f1⁻¹)` form which needs `f1` invertible);
  * candidate scoring streams over chunks with `lax.map`, keeping only
    per-candidate scalars (inlier count / mean inlier residual); full
    residual rows are recomputed only for the top-K and the final winner.
    The reference instead materializes (B, 3*iters, N) residuals and offers
    a `loopresidual` escape hatch when that OOMs (fundamental.py:89-96) —
    the streaming design makes the escape hatch the default and free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vggsfm_tpu.ops.eigh import eigh_small, smallest_eigenvector
from vggsfm_tpu.ops.polynomial import solve_cubic
from vggsfm_tpu.ops.svd3 import project_rank2
from vggsfm_tpu.twoview.utils import (
    BIG_RESIDUAL,
    generate_samples,
    normalize_points_masked,
    residual_indicator,
    sampson_epipolar_distance,
)
from vggsfm_tpu.utils.precision import f32_matmuls


def _corr_rows(p1n: jax.Array, p2n: jax.Array) -> jax.Array:
    """Epipolar constraint rows [x'x, x'y, x', y'x, y'y, y', x, y, 1]."""
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    one = jnp.ones_like(x1)
    return jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1)


def _denormalize(F: jax.Array, t1: jax.Array, t2: jax.Array) -> jax.Array:
    """T2ᵀ F T1 followed by Frobenius normalization (scale is gauge)."""
    F = jnp.einsum("...ji,...jk,...kl->...il", t2, F, t1)
    return F / jnp.maximum(
        jnp.linalg.norm(F, axis=(-2, -1), keepdims=True), 1e-12)


@f32_matmuls
def run_8point(points1: jax.Array, points2: jax.Array,
               masks: jax.Array | None = None) -> jax.Array:
    """Masked normalized 8-point DLT -> rank-2 F. (..., N, 2) x2 -> (..., 3, 3).

    Parity: fundamental.py:254-333.
    """
    if masks is None:
        masks = jnp.ones_like(points1[..., 0])
    p1n, t1 = normalize_points_masked(points1, masks)
    p2n, t2 = normalize_points_masked(points2, masks)
    X = _corr_rows(p1n, p2n) * masks[..., None]
    XtX = jnp.einsum("...ni,...nj->...ij", X, X)
    f = smallest_eigenvector(XtX, num_sweeps=8)
    F = f.reshape(f.shape[:-1] + (3, 3))
    F = project_rank2(F)
    return _denormalize(F, t1, t2)


def _det_cols(a: jax.Array, b: jax.Array, c: jax.Array) -> jax.Array:
    """det of the 3x3 matrix with columns a, b, c (each (..., 3))."""
    return jnp.einsum("...i,...i->...", a, jnp.cross(b, c))


@f32_matmuls
def run_7point(points1: jax.Array, points2: jax.Array):
    """7-point solver: (B, 7, 2) x2 -> (F (B, 3, 3, 3), valid (B, 3)).

    Each minimal set yields up to 3 fundamental matrices (roots of the cubic
    det constraint); invalid root slots are masked. Parity:
    fundamental.py:341-469, with the det expansion replacing matrix inverses.
    """
    p1n, t1 = normalize_points_masked(points1)
    p2n, t2 = normalize_points_masked(points2)
    A = _corr_rows(p1n, p2n)  # (B, 7, 9)
    AtA = jnp.einsum("bni,bnj->bij", A, A)
    w, V = eigh_small(AtA, num_sweeps=8, sort=True)
    f2 = V[..., :, 0].reshape(-1, 3, 3)  # smallest  (reference's v[...,8])
    f1 = V[..., :, 1].reshape(-1, 3, 3)  # 2nd-smallest (v[...,7])

    # det(lambda * f1 + f2) = 0: cubic in lambda via column multilinearity.
    a1, b1, c1 = f1[..., :, 0], f1[..., :, 1], f1[..., :, 2]
    a2, b2, c2 = f2[..., :, 0], f2[..., :, 1], f2[..., :, 2]
    c3 = _det_cols(a1, b1, c1)
    c2_ = (_det_cols(a2, b1, c1) + _det_cols(a1, b2, c1)
           + _det_cols(a1, b1, c2))
    c1_ = (_det_cols(a2, b2, c1) + _det_cols(a2, b1, c2)
           + _det_cols(a1, b2, c2))
    c0 = _det_cols(a2, b2, c2)
    roots, valid = solve_cubic(jnp.stack([c3, c2_, c1_, c0], axis=-1))

    F = (roots[..., :, None, None] * f1[..., None, :, :]
         + f2[..., None, :, :])  # (B, 3, 3, 3)
    F = _denormalize(F, t1[..., None, :, :], t2[..., None, :, :])
    return F, valid


def _pad_to_multiple(x: jax.Array, axis: int, multiple: int, value=0.0):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value), n


def _stream_scores(points1, points2, Fs, cand_valid, point_valid, thres,
                   chunk, squared):
    """Per-candidate (inlier_num, mean inlier residual) without a full
    (B, C, N) residual tensor: lax.map over candidate chunks."""
    B, C = Fs.shape[:2]
    Fs_p, C0 = _pad_to_multiple(Fs, 1, chunk)
    valid_p, _ = _pad_to_multiple(cand_valid, 1, chunk, value=False)
    n_chunks = Fs_p.shape[1] // chunk
    Fs_c = jnp.moveaxis(Fs_p.reshape(B, n_chunks, chunk, 3, 3), 1, 0)
    valid_c = jnp.moveaxis(valid_p.reshape(B, n_chunks, chunk), 1, 0)

    def body(args):
        F_chunk, v_chunk = args
        res = sampson_epipolar_distance(points1, points2, F_chunk,
                                        squared=squared)
        res = jnp.where(point_valid[:, None, :], res, BIG_RESIDUAL)
        res = jnp.where(v_chunk[..., None], res, BIG_RESIDUAL)
        inl = res <= thres
        num = jnp.sum(inl, axis=-1)
        mean = jnp.sum(jnp.where(inl, res, 0.0), axis=-1) / jnp.maximum(num, 1)
        return num, mean

    num, mean = jax.lax.map(body, (Fs_c, valid_c))
    num = jnp.moveaxis(num, 0, 1).reshape(B, -1)[:, :C0]
    mean = jnp.moveaxis(mean, 0, 1).reshape(B, -1)[:, :C0]
    return num, mean


def _stream_local_refine(points1, points2, Fs_sel, point_valid, thres, chunk,
                         squared):
    """8-point refinement of selected candidates: recompute each candidate's
    inlier mask, then masked DLT — streamed over chunks of candidates."""
    B, L = Fs_sel.shape[:2]
    Fs_p, L0 = _pad_to_multiple(Fs_sel, 1, chunk)
    n_chunks = Fs_p.shape[1] // chunk
    Fs_c = jnp.moveaxis(Fs_p.reshape(B, n_chunks, chunk, 3, 3), 1, 0)

    def body(F_chunk):
        res = sampson_epipolar_distance(points1, points2, F_chunk,
                                        squared=squared)
        res = jnp.where(point_valid[:, None, :], res, BIG_RESIDUAL)
        inl = res <= thres  # (B, chunk, N)
        p1 = jnp.broadcast_to(points1[:, None], inl.shape + (2,))
        p2 = jnp.broadcast_to(points2[:, None], inl.shape + (2,))
        return run_8point(p1, p2, inl.astype(points1.dtype))

    F_lo = jax.lax.map(body, Fs_c)  # (n_chunks, B, chunk, 3, 3)
    F_lo = jnp.moveaxis(F_lo, 0, 1).reshape(B, -1, 3, 3)[:, :L0]
    return F_lo


@partial(jax.jit, static_argnames=(
    "max_ransac_iters", "lo_num", "squared", "second_refine", "chunk"))
def estimate_fundamental(
    points1: jax.Array,
    points2: jax.Array,
    key: jax.Array,
    max_ransac_iters: int = 1024,
    max_error: float = 0.5,
    lo_num: int = 128,
    valid_mask: jax.Array | None = None,
    squared: bool = True,
    second_refine: bool = True,
    chunk: int = 128,
):
    """LORANSAC fundamental-matrix estimation over batched pairs.

    Args:
      points1, points2: (B, N, 2) correspondences per pair.
      key: PRNG key driving minimal-set sampling (shared across the batch,
        like the reference's single host-side sample table).
      valid_mask: optional (B, N) bool of usable correspondences.

    Returns dict with ``fmat (B,3,3)``, ``inlier_num (B,)``,
    ``inlier_mask (B,N)``, ``residuals (B,N)``.
    Parity: fundamental.py:43-183.
    """
    B, N, _ = points1.shape
    thres = max_error**2 if squared else max_error
    if valid_mask is None:
        valid_mask = jnp.ones((B, N), dtype=bool)

    sample_idx, trial_valid = generate_samples(key, N, max_ransac_iters, 7)
    left = jnp.take(points1, sample_idx, axis=1).reshape(-1, 7, 2)
    right = jnp.take(points2, sample_idx, axis=1).reshape(-1, 7, 2)

    F7, root_valid = run_7point(left, right)
    F7 = F7.reshape(B, max_ransac_iters * 3, 3, 3)
    cand_valid = (root_valid.reshape(B, max_ransac_iters, 3)
                  & trial_valid[None, :, None]).reshape(B, -1)

    num0, mean0 = _stream_scores(points1, points2, F7, cand_valid, valid_mask,
                                 thres, chunk, squared)

    # ---- local refinement round 1
    score0 = jnp.where(cand_valid, num0, -1)
    _, sel1 = jax.lax.top_k(score0, lo_num)
    F_sel1 = jnp.take_along_axis(F7, sel1[..., None, None], axis=1)
    F_lo1 = _stream_local_refine(points1, points2, F_sel1, valid_mask, thres,
                                 min(chunk, 32), squared)
    valid1 = jnp.ones(F_lo1.shape[:2], dtype=bool)
    num1, mean1 = _stream_scores(points1, points2, F_lo1, valid1, valid_mask,
                                 thres, chunk, squared)

    all_F = [F7, F_lo1]
    all_num = [num0, num1]
    all_mean = [mean0, mean1]
    all_valid = [cand_valid, valid1]

    # ---- local refinement round 2 (on the best refined candidates)
    if second_refine:
        _, sel2 = jax.lax.top_k(num1, lo_num // 2)
        F_sel2 = jnp.take_along_axis(F_lo1, sel2[..., None, None], axis=1)
        F_lo2 = _stream_local_refine(points1, points2, F_sel2, valid_mask,
                                     thres, min(chunk, 32), squared)
        valid2 = jnp.ones(F_lo2.shape[:2], dtype=bool)
        num2, mean2 = _stream_scores(points1, points2, F_lo2, valid2,
                                     valid_mask, thres, chunk, squared)
        all_F.append(F_lo2)
        all_num.append(num2)
        all_mean.append(mean2)
        all_valid.append(valid2)

    F_all = jnp.concatenate(all_F, axis=1)
    num_all = jnp.concatenate(all_num, axis=1)
    mean_all = jnp.concatenate(all_mean, axis=1)
    valid_all = jnp.concatenate(all_valid, axis=1)

    score = residual_indicator(num_all, mean_all, valid_all)
    best = jnp.argmax(score, axis=1)
    best_F = jnp.take_along_axis(F_all, best[:, None, None, None],
                                 axis=1)[:, 0]

    res_best = sampson_epipolar_distance(points1, points2, best_F[:, None],
                                         squared=squared)[:, 0]
    res_best = jnp.where(valid_mask, res_best, BIG_RESIDUAL)
    inlier_mask = res_best <= thres
    return {
        "fmat": best_F,
        "inlier_num": jnp.sum(inlier_mask, axis=-1),
        "inlier_mask": inlier_mask,
        "residuals": res_best,
    }
