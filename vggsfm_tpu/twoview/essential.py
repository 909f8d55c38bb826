"""Essential matrix from F, decomposition to (R, t), cheirality selection.

Parity: vggsfm/two_view_geo/fundamental.py:186-246
(`essential_from_fundamental`), essential.py:36-108 (decomposition),
utils.py:325-363 (`remove_cheirality`). The SVD of E uses the eigh-based
3x3 factorization in `vggsfm_tpu.ops.svd3` — no general SVD on the TPU path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.ops.svd3 import svd3x3
from vggsfm_tpu.twoview.utils import check_cheirality
from vggsfm_tpu.utils.precision import f32_matmuls


@f32_matmuls
def essential_from_fundamental(fmat: jax.Array, kmat1: jax.Array,
                               kmat2: jax.Array) -> jax.Array:
    """E = K2ᵀ F K1 (Hartley & Zisserman eq. 9.12), Frobenius-normalized."""
    E = jnp.einsum("...ji,...jk,...kl->...il", kmat2, fmat, kmat1)
    return E / jnp.maximum(jnp.linalg.norm(E, axis=(-2, -1), keepdims=True),
                           1e-12)


@f32_matmuls
def decompose_essential_matrix(E_mat: jax.Array):
    """(..., 3, 3) essential -> 4 candidate poses (R (..., 4, 3, 3), t (..., 4, 3)).

    R in {U W Vᵀ, U Wᵀ Vᵀ}, t = ±u3. U, V from `svd3x3` are already proper
    rotations, so no det-flips are needed (the reference patches U/V signs
    after cuSOLVER, essential.py:60-66).
    """
    U, _, V = svd3x3(E_mat)
    W = jnp.array([[0.0, -1.0, 0.0],
                   [1.0, 0.0, 0.0],
                   [0.0, 0.0, 1.0]], dtype=E_mat.dtype)
    R1 = jnp.einsum("...ij,jk,...lk->...il", U, W, V)
    R2 = jnp.einsum("...ij,kj,...lk->...il", U, W, V)
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def remove_cheirality(R: jax.Array, t: jax.Array, points1: jax.Array,
                      points2: jax.Array, focal_length: jax.Array | None = None,
                      principal_point: jax.Array | None = None):
    """Pick the (R, t) candidate with the most points in front of both cameras.

    Args:
      R: (B, 4, 3, 3) candidate rotations; t: (B, 4, 3).
      points1, points2: (B, N, 2) image points — pixel coords if
        focal/principal supplied ((B, 4) packed as [f1x,f1y,f2x,f2y] /
        [c1x,c1y,c2x,c2y]), else already normalized.

    Returns (R (B,3,3), t (B,3)). Parity: utils.py:325-363.
    """
    if focal_length is not None:
        points1 = (points1 - principal_point[:, None, :2]) / \
            focal_length[:, None, :2]
        points2 = (points2 - principal_point[:, None, 2:]) / \
            focal_length[:, None, 2:]

    B, C = R.shape[:2]
    N = points1.shape[1]
    Rf = R.reshape(B * C, 3, 3)
    tf = t.reshape(B * C, 3)
    p1 = jnp.broadcast_to(points1[:, None], (B, C, N, 2)).reshape(B * C, N, 2)
    p2 = jnp.broadcast_to(points2[:, None], (B, C, N, 2)).reshape(B * C, N, 2)

    counts, _ = check_cheirality(Rf, tf, p1, p2)
    best = jnp.argmax(counts.reshape(B, C), axis=1)
    R_best = jnp.take_along_axis(R, best[:, None, None, None], axis=1)[:, 0]
    t_best = jnp.take_along_axis(t, best[:, None, None], axis=1)[:, 0]
    return R_best, t_best
