"""Nistér 5-point essential-matrix minimal solver, TPU-native.

Parity target: vggsfm/two_view_geo/essential.py:203-488 (`run_5point`,
LORANSAC wrapper). The reference (via kornia) builds Nistér's 10x20
polynomial coefficient matrix symbolically and solves a 10x10 companion /
action-matrix eigenproblem with cuSOLVER's *non-symmetric* eigensolver —
which TPUs do not have. This implementation reformulates every symbolic
step as batched numerical linear algebra:

  1. nullspace of the 5x9 epipolar system via the 9x9 Jacobi eigensolver:
     E(x, y, z) = x X + y Y + z Z + W;
  2. the ten cubic constraints (det E = 0 and 2 E Eᵀ E - tr(E Eᵀ) E = 0)
     are trilinear in E, so their 20 monomial coefficients are *exact*
     sums of trilinear forms over the 64 ordered basis triples (a static
     triple -> monomial scatter — no symbolic algebra, no interpolation);
  3. grouping by z-power gives M(z) = M0 + z M1 + z^2 M2 + z^3 M3 acting
     on the (x, y)-monomial vector; solutions satisfy det M(z) = 0;
  4. real roots come from fixed-budget sign-change bisection of the *true*
     determinant (batched 10x10 LU dets on a tangent-warped grid) —
     branch-free, no polynomial interpolation error; spurious roots are
     masked by their constraint residuals downstream;
  5. per root, the (x, y) monomial vector is the smallest eigenvector of
     M(z)ᵀ M(z) (10x10 Jacobi again).

Everything is fixed-shape and vmaps over RANSAC trials.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.ops.eigh import eigh_small, smallest_eigenvector
from vggsfm_tpu.utils.precision import f32_matmuls

# (x, y)-monomial basis paired with z-powers: the 20 Nistér monomials are
# XY_MONOMIALS[i] * z^k for the (i, k) pairs listed in _MONOMIAL_MAP.
# XY basis order: [x^3, x^2 y, x y^2, y^3, x^2, x y, y^2, x, y, 1]
_XY_DEGS = [(3, 0), (2, 1), (1, 2), (0, 3), (2, 0), (1, 1), (0, 2),
            (1, 0), (0, 1), (0, 0)]
# allowed z powers per xy-monomial (total degree <= 3)
_Z_MAX = {(3, 0): 0, (2, 1): 0, (1, 2): 0, (0, 3): 0,
          (2, 0): 1, (1, 1): 1, (0, 2): 1,
          (1, 0): 2, (0, 1): 2, (0, 0): 3}

_MONOMIALS = [(i, k) for i, d in enumerate(_XY_DEGS)
              for k in range(_Z_MAX[d] + 1)]  # 20 entries


# map each ordered basis triple (a, b, c) over w = [x, y, z, 1] to its
# degree-3 monomial id in _MONOMIALS
def _triple_monomial_ids() -> np.ndarray:
    ids = np.zeros((4, 4, 4), np.int32)
    mono_index = {m: i for i, m in enumerate(_MONOMIALS)}
    for a in range(4):
        for b in range(4):
            for c in range(4):
                counts = [0, 0, 0, 0]
                for v in (a, b, c):
                    counts[v] += 1
                xy = (counts[0], counts[1])
                key = (_XY_DEGS.index(xy), counts[2])
                ids[a, b, c] = mono_index[key]
    return ids


_TRIPLE_IDS = _triple_monomial_ids()
_LEVI = np.zeros((3, 3, 3))
for _i, _j, _k in [(0, 1, 2), (1, 2, 0), (2, 0, 1)]:
    _LEVI[_i, _j, _k] = 1.0
for _i, _j, _k in [(0, 2, 1), (2, 1, 0), (1, 0, 2)]:
    _LEVI[_i, _j, _k] = -1.0


@f32_matmuls
def _coefficient_matrices(E_basis: jax.Array):
    """-> (M0, M1, M2, M3), each (10, 10): z-power slices of M(z).

    Exact: det(E) and 2 E Eᵀ E - tr(E Eᵀ) E are trilinear in E, so each
    monomial coefficient is the sum of the trilinear form over the ordered
    basis triples mapping to that monomial (no interpolation error).
    """
    B = E_basis  # (4, 3, 3)
    levi = jnp.asarray(_LEVI, jnp.float32)
    # det: eps_ijk Ba[0,i] Bb[1,j] Bc[2,k]  -> (4,4,4)
    tri_det = jnp.einsum("ijk,ai,bj,ck->abc", levi, B[:, 0], B[:, 1],
                         B[:, 2])
    # trace constraint: 2 (Ba Bbᵀ) Bc - tr(Ba Bbᵀ) Bc -> (4,4,4,3,3)
    AB = jnp.einsum("aij,bkj->abik", B, B)  # Ba Bbᵀ
    tr_ab = jnp.einsum("abii->ab", AB)
    tri_tr = (2.0 * jnp.einsum("abik,ckj->abcij", AB, B)
              - tr_ab[:, :, None, None, None] * B[None, None])
    # scatter ordered triples into the 20 monomials
    tri_all = jnp.concatenate(
        [tri_tr.reshape(64, 9), tri_det.reshape(64, 1)], axis=1)  # (64, 10)
    coeffs = jax.ops.segment_sum(
        tri_all, jnp.asarray(_TRIPLE_IDS.reshape(64)), num_segments=20)

    Ms = [jnp.zeros((10, 10), jnp.float32) for _ in range(4)]
    for c, (i, k) in enumerate(_MONOMIALS):
        Ms[k] = Ms[k].at[:, i].set(Ms[k][:, i] + coeffs[c])
    return tuple(Ms)


def _real_roots_of_det(Ms, grid: int = 512, bisect: int = 48):
    """Up to 10 real roots of z -> det(M(z)) by direct sign-change bisection.

    Bisecting the *true* determinant (a cheap batched 10x10 LU det) avoids
    the f32 error of interpolating the degree-10 coefficients. The grid is
    tangent-warped (dense near zero, covering all reals).
    Returns (roots (10,), valid (10,))."""
    M0, M1, M2, M3 = Ms
    scale = jnp.max(jnp.abs(M0), axis=1, keepdims=True) + 1e-9

    def f(z):
        z = jnp.asarray(z)
        Mz = (M0 + z[..., None, None] * M1
              + (z**2)[..., None, None] * M2
              + (z**3)[..., None, None] * M3)
        return jnp.linalg.det(Mz / scale)

    theta = jnp.linspace(-0.499 * jnp.pi, 0.499 * jnp.pi, grid)
    xs = jnp.tan(theta)
    vals = f(xs)
    sign_change = (vals[:-1] * vals[1:]) < 0
    idx = jnp.argsort(~sign_change)[:10]  # changes sort first
    valid = jnp.take(sign_change, idx)
    lo = jnp.take(xs[:-1], idx)
    hi = jnp.take(xs[1:], idx)

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        same = (f(lo) * f(mid)) > 0
        return jnp.where(same, mid, lo), jnp.where(same, hi, mid)

    lo, hi = jax.lax.fori_loop(0, bisect, body, (lo, hi))
    return 0.5 * (lo + hi), valid


@f32_matmuls
def run_5point(points1: jax.Array, points2: jax.Array):
    """Essential matrices from 5 normalized correspondences, batched.

    Args: points1, points2 (B, 5, 2) *normalized* (K-free) coords.
    Returns (E (B, 10, 3, 3), valid (B, 10)) — up to 10 solutions per
    minimal sample, masked. Parity: essential.py:203-488.
    """
    x1, y1 = points1[..., 0], points1[..., 1]
    x2, y2 = points2[..., 0], points2[..., 1]
    one = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2,
                   x1, y1, one], axis=-1)  # (B, 5, 9)
    AtA = jnp.einsum("bni,bnj->bij", A, A)
    w, V = eigh_small(AtA, num_sweeps=10, sort=True)
    # 4 smallest eigenvectors -> basis [X, Y, Z, W]
    basis = jnp.stack([V[..., :, 3], V[..., :, 2], V[..., :, 1],
                       V[..., :, 0]], axis=1)  # (B, 4, 9)
    E_basis = basis.reshape(-1, 4, 3, 3)

    def solve_one(Eb):
        Ms = _coefficient_matrices(Eb)
        roots, valid = _real_roots_of_det(Ms)

        def e_from_z(z):
            M0, M1, M2, M3 = Ms
            Mz = M0 + z * M1 + z**2 * M2 + z**3 * M3
            m = smallest_eigenvector(
                jnp.einsum("ji,jk->ik", Mz, Mz), num_sweeps=10)
            # xy-monomial vector: [..., x, y, 1] at indices 7, 8, 9
            denom = jnp.where(jnp.abs(m[9]) < 1e-12, 1e-12, m[9])
            x = m[7] / denom
            y = m[8] / denom
            wv = jnp.stack([x, y, z, jnp.ones_like(z)])
            E = jnp.einsum("b,bij->ij", wv, Eb)
            nrm = jnp.linalg.norm(E)
            return E / jnp.maximum(nrm, 1e-12)

        Es = jax.vmap(e_from_z)(roots)  # (10, 3, 3)
        # mask roots whose E violates the constraints
        res = jax.vmap(lambda E: jnp.abs(jnp.linalg.det(E))
                       + jnp.linalg.norm(2 * (E @ E.T) @ E
                                         - jnp.trace(E @ E.T) * E))(Es)
        return Es, valid & (res < 1e-2)

    Es, valid = jax.vmap(solve_one)(E_basis)
    return Es, valid


@partial(jax.jit, static_argnames=("max_ransac_iters",))
def estimate_essential(points1: jax.Array, points2: jax.Array,
                       key: jax.Array, max_ransac_iters: int = 256,
                       max_error: float = 4.0,
                       focal_length: float = 1.0,
                       valid_mask: jax.Array | None = None):
    """LORANSAC essential estimation over (B, N, 2) normalized pairs.

    `max_error` is in pixels and converted to normalized units with
    `focal_length` (parity: essential.py:111-200). Returns dict(emat,
    inlier_num, inlier_mask).
    """
    from vggsfm_tpu.twoview.utils import (
        BIG_RESIDUAL,
        generate_samples,
        residual_indicator,
        sampson_epipolar_distance,
    )

    B, N, _ = points1.shape
    thres = (max_error / focal_length) ** 2
    if valid_mask is None:
        valid_mask = jnp.ones((B, N), bool)

    idx, trial_valid = generate_samples(key, N, max_ransac_iters, 5)
    left = jnp.take(points1, idx, axis=1).reshape(-1, 5, 2)
    right = jnp.take(points2, idx, axis=1).reshape(-1, 5, 2)
    E_cand, e_valid = run_5point(left, right)
    E_cand = E_cand.reshape(B, max_ransac_iters * 10, 3, 3)
    cand_valid = (e_valid.reshape(B, max_ransac_iters, 10)
                  & trial_valid[None, :, None]).reshape(B, -1)

    res = sampson_epipolar_distance(points1, points2, E_cand, squared=True)
    res = jnp.where(valid_mask[:, None], res, BIG_RESIDUAL)
    res = jnp.where(cand_valid[..., None], res, BIG_RESIDUAL)
    inl = res <= thres
    num = jnp.sum(inl, axis=-1)
    mean = jnp.sum(jnp.where(inl, res, 0.0), axis=-1) / jnp.maximum(num, 1)

    score = residual_indicator(num, mean, cand_valid)
    best = jnp.argmax(score, axis=1)
    E_best = jnp.take_along_axis(E_cand, best[:, None, None, None],
                                 axis=1)[:, 0]
    res_best = sampson_epipolar_distance(points1, points2, E_best[:, None],
                                         squared=True)[:, 0]
    res_best = jnp.where(valid_mask, res_best, BIG_RESIDUAL)
    inlier = res_best <= thres
    return {"emat": E_best, "inlier_num": jnp.sum(inlier, axis=-1),
            "inlier_mask": inlier}
