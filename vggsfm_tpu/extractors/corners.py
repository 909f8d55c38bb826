"""Harris corner detector, pure JAX — cheap query-point fallback."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vggsfm_tpu.extractors.dog import gaussian_blur


@partial(jax.jit, static_argnames=("max_keypoints", "nms_radius"))
def detect_harris_keypoints(image: jax.Array, max_keypoints: int = 4096,
                            k: float = 0.04, nms_radius: int = 4):
    """Harris response + local NMS on grayscale (H, W) in [0, 1].

    Returns (xy (K, 2), score (K,), valid (K,)), strongest first.
    """
    H, W = image.shape
    dx = 0.5 * (jnp.roll(image, -1, 1) - jnp.roll(image, 1, 1))
    dy = 0.5 * (jnp.roll(image, -1, 0) - jnp.roll(image, 1, 0))
    Ixx = gaussian_blur(dx * dx, 1.5)
    Iyy = gaussian_blur(dy * dy, 1.5)
    Ixy = gaussian_blur(dx * dy, 1.5)
    det = Ixx * Iyy - Ixy * Ixy
    tr = Ixx + Iyy
    resp = det - k * tr * tr

    # local max over (2r+1)^2 window
    r = nms_radius
    neigh = -jnp.inf * jnp.ones_like(resp)
    for ddy in range(-r, r + 1):
        for ddx in range(-r, r + 1):
            if ddy == 0 and ddx == 0:
                continue
            neigh = jnp.maximum(neigh, jnp.roll(resp, (ddy, ddx), (0, 1)))
    is_peak = (resp > neigh) & (resp > 0)
    border = 4
    mask = jnp.zeros_like(is_peak).at[border:-border, border:-border].set(
        True)
    score = jnp.where(is_peak & mask, resp, 0.0).reshape(-1)

    top_score, top_idx = jax.lax.top_k(score, max_keypoints)
    ys = top_idx // W
    xs = top_idx % W
    xy = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    return xy, top_score, top_score > 0.0
