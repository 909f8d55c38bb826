"""Radial / OpenCV lens distortion (pure JAX).

Supports the three COLMAP camera models the pipeline emits:
  K=1: SIMPLE_RADIAL (k),  K=2: RADIAL (k1,k2),  K=4: OPENCV (k1,k2,p1,p2).

Behavioral parity: reference vggsfm/utils/distortion.py:11-159. The reference
undistorts with a Newton loop using central-difference numeric Jacobians and
`torch.linalg.solve`; here the Jacobian is analytic and the 2x2 system is
solved in closed form, inside a fixed-budget `lax.fori_loop` (jit/vmap-safe,
no data-dependent iteration count). Newton converges quadratically, so 25
iterations exceed the reference's 100-iteration/1e-10 stopping rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _distortion_terms(extra_params: jax.Array, u: jax.Array, v: jax.Array):
    """Return (du, dv) displacement for points; params (..., K), u/v (..., N)."""
    K = extra_params.shape[-1]
    u2, v2 = u * u, v * v
    r2 = u2 + v2
    if K == 1:
        k = extra_params[..., 0:1]
        radial = k * r2
        return u * radial, v * radial
    if K == 2:
        k1 = extra_params[..., 0:1]
        k2 = extra_params[..., 1:2]
        radial = k1 * r2 + k2 * r2 * r2
        return u * radial, v * radial
    if K == 4:
        k1 = extra_params[..., 0:1]
        k2 = extra_params[..., 1:2]
        p1 = extra_params[..., 2:3]
        p2 = extra_params[..., 3:4]
        uv = u * v
        radial = k1 * r2 + k2 * r2 * r2
        du = u * radial + 2 * p1 * uv + p2 * (r2 + 2 * u2)
        dv = v * radial + 2 * p2 * uv + p1 * (r2 + 2 * v2)
        return du, dv
    raise ValueError(f"Unsupported number of distortion parameters: {K}")


def apply_distortion(extra_params: jax.Array, u: jax.Array, v: jax.Array):
    """Distort normalized coords. params (..., K); u, v (..., N) -> (u', v')."""
    du, dv = _distortion_terms(extra_params, u, v)
    return u + du, v + dv


def _distortion_jacobian(extra_params: jax.Array, u: jax.Array, v: jax.Array):
    """Analytic Jacobian of the *distorted* point wrt (u, v).

    Returns (J00, J01, J10, J11) of d(u+du, v+dv)/d(u, v).
    """
    K = extra_params.shape[-1]
    u2, v2 = u * u, v * v
    r2 = u2 + v2
    k1 = extra_params[..., 0:1]
    k2 = extra_params[..., 1:2] if K >= 2 else jnp.zeros_like(k1)
    radial = k1 * r2 + k2 * r2 * r2
    dr = k1 + 2.0 * k2 * r2  # d(radial)/d(r2)
    J00 = 1.0 + radial + 2.0 * u2 * dr
    J01 = 2.0 * u * v * dr
    J10 = J01
    J11 = 1.0 + radial + 2.0 * v2 * dr
    if K == 4:
        p1 = extra_params[..., 2:3]
        p2 = extra_params[..., 3:4]
        J00 = J00 + 2.0 * p1 * v + 6.0 * p2 * u
        J01 = J01 + 2.0 * p1 * u + 2.0 * p2 * v
        J10 = J10 + 2.0 * p2 * v + 2.0 * p1 * u
        J11 = J11 + 2.0 * p2 * u + 6.0 * p1 * v
    return J00, J01, J10, J11


def undistort_points(
    extra_params: jax.Array,
    tracks_normalized: jax.Array,
    num_iters: int = 25,
) -> jax.Array:
    """Invert `apply_distortion` by Newton iteration.

    Args:
      extra_params: (..., K) distortion parameters.
      tracks_normalized: (..., N, 2) distorted normalized coordinates.
      num_iters: fixed Newton budget (static for jit).

    Parity: distortion.py:27-99 (`iterative_undistortion`).
    """
    target_u = tracks_normalized[..., 0]
    target_v = tracks_normalized[..., 1]

    def body(_, uv):
        u, v = uv
        fu, fv = apply_distortion(extra_params, u, v)
        rx = target_u - fu
        ry = target_v - fv
        J00, J01, J10, J11 = _distortion_jacobian(extra_params, u, v)
        det = J00 * J11 - J01 * J10
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        du = (J11 * rx - J01 * ry) / det
        dv = (-J10 * rx + J00 * ry) / det
        return (u + du, v + dv)

    u, v = jax.lax.fori_loop(
        0, num_iters, body, (target_u, target_v)
    )
    return jnp.stack([u, v], axis=-1)


# Kept for API parity with the reference (distortion.py:11-24): one forward
# application used as a cheap fallback when the iterative path is disabled.
def single_undistortion(
    extra_params: jax.Array, tracks_normalized: jax.Array
) -> jax.Array:
    u, v = apply_distortion(
        extra_params, tracks_normalized[..., 0], tracks_normalized[..., 1]
    )
    return jnp.stack([u, v], axis=-1)
