"""Batched symmetric eigensolver for small (n<=8) matrices, pure JAX.

The multi-view DLT triangulation reduces each track to the smallest
eigenvector of a 4x4 normal matrix; LORANSAC triangulation calls this over
(tracks x trials) batches that reach millions of matrices. The reference
leans on cuSOLVER's batched `eigh`, which caps batches at 1,024,000 and
forces host-side splitting (reference: triangulation_helpers.py:73-85).

Here we use a fixed-sweep cyclic Jacobi iteration: branch-free, fully
vectorized over the batch, no batch-size cap, and it lowers to plain VPU/MXU
ops so XLA fuses it into the surrounding triangulation graph. For n=4,
5 sweeps give ~1e-7 relative accuracy in f32, more than the DLT needs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _jacobi_rotation(A, V, p: int, q: int):
    """One batched Givens rotation zeroing A[..., p, q] (p < q static)."""
    app = A[..., p, p]
    aqq = A[..., q, q]
    apq = A[..., p, q]

    small = jnp.abs(apq) <= 1e-30 * (jnp.abs(app) + jnp.abs(aqq) + 1e-30)
    safe_apq = jnp.where(small, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)  # tau==0 -> 45° rotation
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    # Apply G^T A G and V G with G = I + (c-1)(e_p e_pᵀ + e_q e_qᵀ) + s(e_p e_qᵀ - e_q e_pᵀ)
    Ap = A[..., :, p]
    Aq = A[..., :, q]
    c_ = c[..., None]
    s_ = s[..., None]
    A_new_p = c_ * Ap - s_ * Aq
    A_new_q = s_ * Ap + c_ * Aq
    A = A.at[..., :, p].set(A_new_p).at[..., :, q].set(A_new_q)
    Rp = A[..., p, :]
    Rq = A[..., q, :]
    A_new_rp = c_ * Rp - s_ * Rq
    A_new_rq = s_ * Rp + c_ * Rq
    A = A.at[..., p, :].set(A_new_rp).at[..., q, :].set(A_new_rq)

    Vp = V[..., :, p]
    Vq = V[..., :, q]
    V = V.at[..., :, p].set(c_ * Vp - s_ * Vq)
    V = V.at[..., :, q].set(s_ * Vp + c_ * Vq)
    return A, V


def _round_robin_rounds(n: int) -> list:
    """Circle-method tournament schedule: a list of rounds, each an
    (m, 2) int array of DISJOINT index pairs; together they cover all
    n(n-1)/2 pairs exactly once."""
    import numpy as np

    players = list(range(n)) + ([-1] if n % 2 else [])
    m = len(players)
    rounds = []
    for _ in range(m - 1):
        pairs = [
            (min(players[i], players[m - 1 - i]),
             max(players[i], players[m - 1 - i]))
            for i in range(m // 2)
            if players[i] != -1 and players[m - 1 - i] != -1
        ]
        rounds.append(np.asarray(pairs, np.int32))
        players = [players[0], players[-1]] + players[1:-1]
    return rounds


def _parallel_round(A, V, p, q):
    """Apply one round of DISJOINT Givens rotations as a single batched
    similarity transform A <- Gᵀ A G, V <- V G.

    `p`, `q` are STATIC (m,) index arrays with all 2m indices distinct,
    so the individual rotations commute and their product G is one
    orthogonal matrix — the transform is exactly a similarity regardless
    of ordering (parallel-order Jacobi; angles all read from the same A,
    which trades a little per-sweep convergence for a ~40x smaller graph
    and 6x less serialization than one-rotation-at-a-time).
    """
    n = A.shape[-1]
    app = A[..., p, p]
    aqq = A[..., q, q]
    apq = A[..., p, q]

    small = jnp.abs(apq) <= 1e-30 * (jnp.abs(app) + jnp.abs(aqq) + 1e-30)
    safe_apq = jnp.where(small, 1.0, apq)
    tau = (aqq - app) / (2.0 * safe_apq)
    t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(tau == 0.0, 1.0, t)
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c

    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    G = eye.at[..., p, p].set(c)
    G = G.at[..., q, q].set(c)
    G = G.at[..., p, q].set(s)
    G = G.at[..., q, p].set(-s)
    A = jnp.einsum("...ji,...jk,...kl->...il", G, A, G,
                   precision=jax.lax.Precision.HIGHEST)
    V = jnp.einsum("...ij,...jk->...ik", V, G,
                   precision=jax.lax.Precision.HIGHEST)
    return A, V


@partial(jax.jit, static_argnames=("num_sweeps", "sort"))
def eigh_small(A: jax.Array, num_sweeps: int = 6, sort: bool = True):
    """Eigendecomposition of batched symmetric matrices (..., n, n), n small.

    Returns (eigenvalues (..., n) ascending, eigenvectors (..., n, n) with
    eigenvectors in columns), matching `jnp.linalg.eigh` conventions.
    """
    n = A.shape[-1]
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    # Scale for numerical range; Jacobi is scale-invariant in exact math but
    # normalizing keeps f32 intermediates healthy for badly scaled inputs.
    scale = jnp.max(jnp.abs(A), axis=(-1, -2), keepdims=True)
    scale = jnp.where(scale == 0, 1.0, scale)
    A = A / scale

    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)

    if n > 6:
        # parallel-order sweeps: the one-rotation-at-a-time unroll costs
        # ~13 ops x n(n-1)/2 pairs of graph PER SWEEP BODY (8.6k HLO
        # lines at n=12 — once the dominant compile cost of the whole
        # SfM program via the PnP DLT); the tournament schedule applies
        # each round of disjoint rotations as one batched matmul pair.
        # Two extra sweeps compensate the slightly slower per-sweep
        # convergence of same-A angle reads (verified vs numpy eigh and
        # the ill-conditioned minimal-set PnP nullspaces of test_pnp).
        rounds = _round_robin_rounds(n)

        def sweep(_, AV):
            A, V = AV
            for pr in rounds:
                A, V = _parallel_round(A, V, pr[:, 0], pr[:, 1])
            return A, V

        A, V = jax.lax.fori_loop(0, num_sweeps + 2, sweep, (A, V))
    else:
        pairs = [(p, q) for p in range(n) for q in range(p + 1, n)]

        # one sweep unrolls the static (p, q) schedule; sweeps iterate via
        # fori_loop so the traced graph stays num_sweeps-times smaller (the
        # fully unrolled version costs minutes of XLA compile for n >= 9)
        def sweep(_, AV):
            A, V = AV
            for p, q in pairs:
                A, V = _jacobi_rotation(A, V, p, q)
            return A, V

        A, V = jax.lax.fori_loop(0, num_sweeps, sweep, (A, V))

    w = jnp.diagonal(A, axis1=-2, axis2=-1) * scale[..., 0]
    if sort:
        order = jnp.argsort(w, axis=-1)
        w = jnp.take_along_axis(w, order, axis=-1)
        V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


@partial(jax.jit, static_argnames=("num_sweeps",))
def smallest_eigenvector(A: jax.Array, num_sweeps: int = 6) -> jax.Array:
    """Eigenvector of the smallest eigenvalue of (..., n, n) symmetric A.

    The DLT workhorse: avoids the sort by a one-hot argmin contraction.
    """
    w, V = eigh_small(A, num_sweeps=num_sweeps, sort=False)
    idx = jnp.argmin(w, axis=-1)
    onehot = jax.nn.one_hot(idx, w.shape[-1], dtype=A.dtype)
    return jnp.einsum("...q,...nq->...n", onehot, V)
