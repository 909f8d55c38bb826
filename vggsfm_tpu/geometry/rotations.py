"""Rotation representations and conversions (pure JAX).

Conventions match PyTorch3D-style quaternions: real part first (w, x, y, z),
rotation matrices act on column vectors (``p' = R @ p``).

Behavioral parity with reference: minipytorch3d/rotation_conversions.py:43-177.
Implementation is branch-free and vmap-friendly: `matrix_to_quaternion` uses
the four-candidate construction with a soft `argmax` selection expressed as a
one-hot gather, so it lowers to pure vector ops on TPU (no data-dependent
control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_to_matrix(quaternions: jax.Array) -> jax.Array:
    """Convert quaternions (..., 4) [w,x,y,z] to rotation matrices (..., 3, 3)."""
    q = quaternions
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with zero subgradient at 0."""
    positive = x > 0
    safe = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def matrix_to_quaternion(matrix: jax.Array) -> jax.Array:
    """Convert rotation matrices (..., 3, 3) to quaternions (..., 4) [w,x,y,z].

    Uses the numerically-stable four-candidate method: compute the quaternion
    via each of the four diagonal branches, pick the branch with the largest
    denominator. Selection is a one-hot contraction (TPU friendly, no gather).
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [m[..., t] for t in range(9)]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # candidate quaternions, each scaled by 2*q_abs[branch]
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 branches, 4)

    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)
    out = jnp.einsum("...b,...bq->...q", onehot, quat_candidates)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, jnp.finfo(matrix.dtype).tiny)


def standardize_quaternion(q: jax.Array) -> jax.Array:
    """Force a non-negative real part (each q and -q encode the same rotation)."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions (..., 4), real part first."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(q: jax.Array) -> jax.Array:
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def axis_angle_to_matrix(axis_angle: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Rodrigues formula: axis-angle vectors (..., 3) to matrices (..., 3, 3).

    Written as ``I + A(θ) K + B(θ) K²`` with K built from the *raw* vector
    and A = sinθ/θ, B = (1-cosθ)/θ² Taylor-expanded near zero, so the map is
    smooth (and forward-differentiable) at ω = 0 — the exact linearization
    point of the bundle adjuster's pose updates.
    """
    x, y, z = axis_angle[..., 0], axis_angle[..., 1], axis_angle[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(axis_angle.shape[:-1] + (3, 3))
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, eps * eps))
    small = theta2 < eps * eps
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, eps * eps))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    return eye + A * K + B * (K @ K)


def so3_geodesic_angle(R1: jax.Array, R2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Angle (radians) of the relative rotation R1ᵀR2, batched (..., 3, 3)."""
    rel = jnp.einsum("...ji,...jk->...ik", R1, R2)
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + eps, 1.0 - eps)
    return jnp.arccos(cos)
