"""Difference-of-Gaussians keypoint detector (SIFT-style), pure JAX.

Replaces the reference's LightGlue-SIFT query-point source
(vggsfm/runners/runner.py:1400-1406): we only need keypoint *locations*
(the tracker does the matching), so this implements the scale-space extrema
detection stage of SIFT — Gaussian pyramid, DoG, 3x3x3 non-max suppression,
contrast + edge-response tests — as fixed-shape tensor ops with a top-K
selection instead of dynamic threshold lists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur of (H, W) image."""
    radius = max(1, int(3.0 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    img = jnp.pad(img, ((radius, radius), (0, 0)), mode="edge")
    img = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                   in_axes=1, out_axes=1)(img)
    img = jnp.pad(img, ((0, 0), (radius, radius)), mode="edge")
    img = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(img)
    return img


@partial(jax.jit, static_argnames=("max_keypoints", "num_octaves",
                                   "scales_per_octave"))
def detect_dog_keypoints(
    image: jax.Array,
    max_keypoints: int = 4096,
    num_octaves: int = 4,
    scales_per_octave: int = 3,
    contrast_thresh: float = 0.015,
    edge_ratio: float = 10.0,
):
    """Detect scale-space blob keypoints on a grayscale (H, W) image in [0,1].

    Returns (xy (K, 2) float pixel coords, score (K,), valid (K,) bool) with
    K = max_keypoints, strongest responses first.
    """
    H, W = image.shape
    sigma0 = 1.6
    k = 2.0 ** (1.0 / scales_per_octave)

    all_xy = []
    all_score = []
    img = image
    scale_mult = 1.0
    for octave in range(num_octaves):
        h, w = img.shape
        if min(h, w) < 16:
            break
        sigmas = [sigma0 * k**s for s in range(scales_per_octave + 3)]
        gauss = [gaussian_blur(img, s) for s in sigmas]
        dogs = jnp.stack([gauss[i + 1] - gauss[i]
                          for i in range(len(gauss) - 1)])  # (S+2, h, w)

        mid = dogs[1:-1]  # candidate scales (S, h, w)
        # 3x3x3 neighborhood extremum test via shifted comparisons
        stack = []
        for ds in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if ds == 0 and dy == 0 and dx == 0:
                        continue
                    shifted = jnp.roll(dogs, (ds, dy, dx), axis=(0, 1, 2))
                    stack.append(shifted[1:-1])
        neigh = jnp.stack(stack)  # (26, S, h, w)
        is_max = jnp.all(mid > neigh, axis=0)
        is_min = jnp.all(mid < neigh, axis=0)
        extremum = (is_max | is_min) & (jnp.abs(mid) > contrast_thresh)

        # Harris-style edge rejection on the DoG surface
        dxx = (jnp.roll(mid, -1, 2) + jnp.roll(mid, 1, 2) - 2 * mid)
        dyy = (jnp.roll(mid, -1, 1) + jnp.roll(mid, 1, 1) - 2 * mid)
        dxy = 0.25 * (jnp.roll(mid, (-1, -1), (1, 2))
                      + jnp.roll(mid, (1, 1), (1, 2))
                      - jnp.roll(mid, (-1, 1), (1, 2))
                      - jnp.roll(mid, (1, -1), (1, 2)))
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        r = edge_ratio
        edge_ok = (det > 0) & (tr * tr * r < (r + 1) ** 2 * det)
        extremum &= edge_ok

        # border guard
        border = 4
        mask = jnp.zeros_like(extremum)
        mask = mask.at[:, border:-border, border:-border].set(True)
        extremum &= mask

        score = jnp.where(extremum, jnp.abs(mid), 0.0)
        score_flat = score.reshape(-1)
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        xs = jnp.broadcast_to(xx[None], mid.shape).reshape(-1)
        ys = jnp.broadcast_to(yy[None], mid.shape).reshape(-1)
        all_xy.append(jnp.stack([xs, ys], axis=-1) * scale_mult)
        all_score.append(score_flat)

        img = gauss[scales_per_octave][::2, ::2]
        scale_mult *= 2.0

    xy = jnp.concatenate(all_xy, axis=0).astype(jnp.float32)
    score = jnp.concatenate(all_score, axis=0)
    top_score, top_idx = jax.lax.top_k(score, max_keypoints)
    top_xy = xy[top_idx]
    return top_xy, top_score, top_score > 0.0
