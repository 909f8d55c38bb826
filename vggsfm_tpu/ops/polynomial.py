"""Closed-form low-degree polynomial root solvers, batched + branch-free.

The 7-point fundamental solver needs real roots of a cubic per RANSAC trial
(reference: vggsfm/two_view_geo/fundamental.py:420 via kornia.solve_cubic).
On TPU we want a fully vectorized, `where`-selected closed form: every trial
computes all branches (linear / quadratic / Cardano / trigonometric) and
selects, so the whole RANSAC sweep stays one fused XLA computation.

Returns an explicit validity mask instead of the reference's zero-root
convention: downstream RANSAC simply assigns invalid candidates an infinite
residual, which keeps selection logic mask-based and jit-able.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


_EPS = 1e-12


def _cbrt(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def solve_cubic(coeffs: jax.Array):
    """Real roots of ``a x^3 + b x^2 + c x + d = 0``.

    Args:
      coeffs: (..., 4) polynomial coefficients ``[a, b, c, d]``.

    Returns:
      roots: (..., 3) real roots (unspecified where invalid).
      valid: (..., 3) bool, True where the matching root slot is a real root.

    Degenerate leading coefficients fall back to quadratic / linear solves,
    with the unused root slots marked invalid.
    """
    a, b, c, d = (coeffs[..., i] for i in range(4))

    a_zero = jnp.abs(a) < _EPS
    b_zero = jnp.abs(b) < _EPS
    c_zero = jnp.abs(c) < _EPS

    # ---- linear branch: c x + d = 0
    lin_root = -d / jnp.where(jnp.abs(c) < _EPS, 1.0, c)
    lin_valid = ~c_zero

    # ---- quadratic branch: b x^2 + c x + d = 0
    b_safe = jnp.where(b_zero, 1.0, b)
    disc_q = c * c - 4.0 * b_safe * d
    sqrt_q = jnp.sqrt(jnp.maximum(disc_q, 0.0))
    # Numerically stable quadratic roots (avoid cancellation).
    qq = -0.5 * (c + jnp.sign(c + (c == 0.0)) * sqrt_q)
    quad_r0 = qq / b_safe
    quad_r1 = d / jnp.where(jnp.abs(qq) < _EPS, 1.0, qq)
    quad_valid = disc_q >= 0.0

    # ---- cubic branch (normalized): x^3 + B x^2 + C x + D
    a_safe = jnp.where(a_zero, 1.0, a)
    B = b / a_safe
    C = c / a_safe
    D = d / a_safe
    # depressed: t^3 + p t + q with x = t - B/3
    shift = B / 3.0
    p = C - B * B / 3.0
    q = 2.0 * B**3 / 27.0 - B * C / 3.0 + D
    disc = 0.25 * q * q + p**3 / 27.0

    # one real root (disc > 0), Cardano
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_single = _cbrt(-0.5 * q + sqrt_disc) + _cbrt(-0.5 * q - sqrt_disc)

    # three real roots (disc <= 0), trigonometric method
    p_neg = jnp.minimum(p, -_EPS)  # p must be < 0 in this branch
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    acos_arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(acos_arg) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    t0 = m * jnp.cos(theta)
    t1 = m * jnp.cos(theta - two_pi_3)
    t2 = m * jnp.cos(theta + two_pi_3)

    three_real = disc <= 0.0
    cub_r0 = jnp.where(three_real, t0, t_single) - shift
    cub_r1 = jnp.where(three_real, t1, t_single) - shift
    cub_r2 = jnp.where(three_real, t2, t_single) - shift

    # ---- assemble
    r0 = jnp.where(a_zero, jnp.where(b_zero, lin_root, quad_r0), cub_r0)
    r1 = jnp.where(a_zero, quad_r1, cub_r1)
    r2 = cub_r2

    v0 = jnp.where(a_zero, jnp.where(b_zero, lin_valid, quad_valid), True)
    v1 = jnp.where(a_zero, ~b_zero & quad_valid, three_real)
    v2 = jnp.where(a_zero, False, three_real)

    roots = jnp.stack([r0, r1, r2], axis=-1)
    valid = jnp.stack([v0, v1, v2], axis=-1)
    return roots, valid
