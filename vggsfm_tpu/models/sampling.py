"""Bilinear feature sampling (gather-based, NHWC).

Parity: vggsfm/models/utils.py:347-447 (`bilinear_sampler`,
`sample_features4d`), which wrap `F.grid_sample(align_corners=True)`.
Re-expressed as explicit corner gathers + lerp weights — on TPU this lowers
to vectorized dynamic-gathers instead of relying on a grid_sample kernel.
Coordinates are in *pixel* units (x in [0, W-1]), matching the reference's
convention before its [-1, 1] normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(fmap: jax.Array, coords: jax.Array,
                    padding_mode: str = "border") -> jax.Array:
    """Sample (B, H, W, C) features at (B, ..., 2) xy pixel coords.

    Returns (B, ..., C). padding_mode 'border' clamps, 'zeros' masks
    out-of-bounds corners to zero (grid_sample semantics,
    align_corners=True).
    """
    B, H, W, C = fmap.shape
    lead = coords.shape[1:-1]
    xy = coords.reshape(B, -1, 2)
    x, y = xy[..., 0], xy[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(ix, iy):
        ix_c = jnp.clip(ix, 0, W - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, H - 1).astype(jnp.int32)
        flat = fmap.reshape(B, H * W, C)
        idx = iy_c * W + ix_c
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        if padding_mode == "zeros":
            ok = ((ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1))
            vals = vals * ok[..., None]
        return vals

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)

    wx = wx[..., None].astype(fmap.dtype)
    wy = wy[..., None].astype(fmap.dtype)
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    return out.reshape((B,) + lead + (C,))


def sample_features4d(fmap: jax.Array, coords: jax.Array) -> jax.Array:
    """(B, H, W, C) sampled at (B, N, 2) -> (B, N, C) (utils.py:415-447)."""
    return bilinear_sample(fmap, coords, padding_mode="border")


def interpolate_bilinear(x: jax.Array, out_hw, align_corners: bool = True):
    """Resize (B, H, W, C) -> (B, h, w, C) with bilinear interpolation.

    align_corners=True matches the reference's F.interpolate calls
    (track_modules/blocks.py:190-194 etc.); implemented by sampling at the
    corner-aligned source grid.
    """
    B, H, W, C = x.shape
    h, w = out_hw
    if align_corners and h > 1 and w > 1:
        ys = jnp.linspace(0.0, H - 1.0, h)
        xs = jnp.linspace(0.0, W - 1.0, w)
    else:
        ys = (jnp.arange(h) + 0.5) * (H / h) - 0.5
        xs = (jnp.arange(w) + 0.5) * (W / w) - 0.5
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    coords = jnp.broadcast_to(jnp.stack([gx, gy], axis=-1)[None],
                              (B, h, w, 2))
    return bilinear_sample(x, coords, padding_mode="border")
