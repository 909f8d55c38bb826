"""Batched 3x3 SVD assembled from small symmetric eigensolves, pure JAX.

The two-view solvers need two SVD-shaped operations on 3x3 matrices:
rank-2 projection of fundamental matrices (reference:
vggsfm/two_view_geo/fundamental.py:324-333) and the essential-matrix
decomposition into rotations (essential.py:36-83). The reference routes both
through cuSOLVER `torch.svd`; on TPU, a general SVD lowers to an expensive
iterative decomposition. Instead we build the factors from the 3x3
eigendecompositions of AᵀA (for V) and derive U = A V Σ⁻¹ with a
Gram-Schmidt + cross-product completion — a handful of fused VPU ops per
matrix, batched without limit.

Conventions: ``svd3x3(A) -> (U, S, V)`` with ``A ≈ U @ diag(S) @ V.T``,
``S[..., 0] >= S[..., 1] >= |S[..., 2]|``, and **U, V proper rotations**
(det = +1). To make det(V)=+1 possible, the smallest singular value
``S[..., 2]`` carries a sign (as in "rotation-variant SVD" used in
Procrustes solvers); for the rank-deficient matrices this module serves
(essential/fundamental, sigma_3 ~ 0) the sign is immaterial.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.ops.eigh import eigh_small
from vggsfm_tpu.utils.precision import f32_matmuls

_EPS = 1e-12


def _normalize(v: jax.Array, eps: float = _EPS):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, eps), n[..., 0]


def _any_orthogonal(u: jax.Array) -> jax.Array:
    """A unit vector orthogonal to unit vector u, deterministic & branch-free."""
    # Pick the coordinate axis least aligned with u, then Gram-Schmidt it.
    idx = jnp.argmin(jnp.abs(u), axis=-1)
    e = jax.nn.one_hot(idx, 3, dtype=u.dtype)
    v = e - jnp.sum(e * u, axis=-1, keepdims=True) * u
    v, _ = _normalize(v)
    return v


@f32_matmuls
def svd3x3(A: jax.Array):
    """Batched SVD of (..., 3, 3) matrices. See module docstring for conventions."""
    AtA = jnp.einsum("...ji,...jk->...ik", A, A)
    w, V = eigh_small(AtA, num_sweeps=8, sort=True)  # ascending
    # descending singular order
    v1, v2, v3 = V[..., :, 2], V[..., :, 1], V[..., :, 0]
    v3 = jnp.cross(v1, v2)  # det(V) = +1 by construction

    u1_raw = jnp.einsum("...ij,...j->...i", A, v1)
    u1, s1 = _normalize(u1_raw)
    # If A ~ 0 fall back to e1-ish direction.
    u1 = jnp.where(s1[..., None] > _EPS, u1, jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], dtype=A.dtype), u1.shape))

    u2_raw = jnp.einsum("...ij,...j->...i", A, v2)
    u2_orth = u2_raw - jnp.sum(u2_raw * u1, axis=-1, keepdims=True) * u1
    u2, s2n = _normalize(u2_orth)
    u2 = jnp.where(s2n[..., None] > _EPS, u2, _any_orthogonal(u1))

    u3 = jnp.cross(u1, u2)  # det(U) = +1

    s1 = jnp.einsum("...i,...ij,...j->...", u1, A, v1)
    s2 = jnp.einsum("...i,...ij,...j->...", u2, A, v2)
    s3 = jnp.einsum("...i,...ij,...j->...", u3, A, v3)  # signed

    U = jnp.stack([u1, u2, u3], axis=-1)
    V = jnp.stack([v1, v2, v3], axis=-1)
    S = jnp.stack([s1, s2, s3], axis=-1)
    return U, S, V


def project_rank2(A: jax.Array) -> jax.Array:
    """Nearest (Frobenius) rank-2 matrix: subtract the sigma_3 dyad.

    Parity: reference fundamental.py:324-333 (zero the smallest singular
    value); here computed as ``A - (u3ᵀ A v3) u3 v3ᵀ`` without re-assembling
    the full factorization.
    """
    U, S, V = svd3x3(A)
    u3 = U[..., :, 2]
    v3 = V[..., :, 2]
    return A - S[..., 2, None, None] * u3[..., :, None] * v3[..., None, :]
