"""SuperPoint keypoint detector (Flax, channels-last).

The reference gets query points from LightGlue's SuperPoint wrapper
(vggsfm/runners/runner.py:1387-1392). This is the standard MagicLeap
architecture: a shared VGG-style encoder, a detector head producing a
65-way (8x8 cell + dustbin) distribution per cell, and a descriptor head.
Weights convert from the public `superpoint_v1.pth` naming
(conv1a..conv4b, convPa/convPb, convDa/convDb) with OIHW->HWIO transposes
(vggsfm_tpu.models.convert handles the generic conv mapping).
"""

from __future__ import annotations

from functools import partial

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class SuperPoint(nn.Module):
    descriptor_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image):
        """(B, H, W, 1) grayscale in [0,1] -> (scores (B,H,W),
        descriptors (B, H/8, W/8, D))."""
        x = image.astype(self.dtype)
        c = [64, 64, 64, 64, 128, 128, 128, 128]
        names = ["conv1a", "conv1b", "conv2a", "conv2b",
                 "conv3a", "conv3b", "conv4a", "conv4b"]
        for i, (ch, name) in enumerate(zip(c, names)):
            x = nn.relu(nn.Conv(ch, (3, 3), padding=1, name=name,
                                dtype=self.dtype)(x))
            if name in ("conv1b", "conv2b", "conv3b"):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # detector head
        d = nn.relu(nn.Conv(256, (3, 3), padding=1, name="convPa",
                            dtype=self.dtype)(x))
        d = nn.Conv(65, (1, 1), name="convPb", dtype=self.dtype)(d)
        d = d.astype(jnp.float32)  # softmax in f32
        prob = jax.nn.softmax(d, axis=-1)[..., :64]
        B, hc, wc, _ = prob.shape
        heat = prob.reshape(B, hc, wc, 8, 8)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(B, hc * 8, wc * 8)

        # descriptor head
        desc = nn.relu(nn.Conv(256, (3, 3), padding=1, name="convDa",
                               dtype=self.dtype)(x))
        desc = nn.Conv(self.descriptor_dim, (1, 1), name="convDb",
                       dtype=self.dtype)(desc).astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12)
        return heat, desc


def convert_superpoint_checkpoint(state_dict) -> dict:
    """MagicLeap superpoint_v1 state_dict -> Flax params."""
    from vggsfm_tpu.models.convert import _conv

    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    return {"params": {n: _conv(state_dict, n) for n in names}}


@partial(jax.jit, static_argnames=("max_keypoints", "nms_radius"))
def superpoint_keypoints_from_heatmap(heat: jax.Array,
                                      max_keypoints: int = 4096,
                                      nms_radius: int = 4,
                                      border: int = 4):
    """(H, W) detector heatmap -> (xy (K,2), score (K,), valid (K,))."""
    H, W = heat.shape
    neigh = -jnp.inf * jnp.ones_like(heat)
    r = nms_radius
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.maximum(neigh, jnp.roll(heat, (dy, dx), (0, 1)))
    peak = (heat > neigh)
    mask = jnp.zeros_like(peak).at[border:-border, border:-border].set(True)
    score = jnp.where(peak & mask, heat, 0.0).reshape(-1)
    top_score, top_idx = jax.lax.top_k(score, max_keypoints)
    xy = jnp.stack([top_idx % W, top_idx // W], axis=-1).astype(jnp.float32)
    return xy, top_score, top_score > 0.0
