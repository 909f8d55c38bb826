"""DINOv2 ViT backbone (with register tokens), Flax.

Re-implementation of the frozen backbone the reference loads from torch.hub
('dinov2_vitb14_reg', vggsfm/models/camera_predictor.py:223-236): patch-14
ViT, class token + 4 register tokens, LayerScale per block, final LayerNorm;
`__call__` returns the normalized patch tokens (the reference's
``x_norm_patchtokens``). Weights are converted from the public torch
checkpoint when available (see vggsfm_tpu.models.convert).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vggsfm_tpu.models.sampling import interpolate_bilinear


class DinoAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, _ = x.shape
        H = self.num_heads
        D = self.dim // H
        qkv = nn.Dense(self.dim * 3, name="qkv", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, L, H, D).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(logits / jnp.sqrt(D), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, self.dim)
        return nn.Dense(self.dim, name="proj", dtype=self.dtype)(out)


class DinoBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,))
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,))
        y = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=self.dtype)(x)
        x = x + (ls1 * DinoAttention(self.dim, self.num_heads, name="attn",
                                     dtype=self.dtype)(y)).astype(x.dtype)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=self.dtype)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1",
                     dtype=self.dtype)(y)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype)(h)
        return x + (ls2 * h).astype(x.dtype)


class DinoVisionTransformer(nn.Module):
    """ViT-B/14 with registers by default; returns normalized patch tokens."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 14
    num_register_tokens: int = 4
    pos_embed_size: int = 37  # pretraining grid (518 / 14)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, return_layers: tuple = ()):
        """(B, H, W, 3), resnet-normalized -> (B, (H/14)*(W/14), C).

        With `return_layers` (static block indices) also returns those
        blocks' patch tokens with the final LayerNorm applied — DINOv2's
        `get_intermediate_layers(norm=True)` semantics, which is what the
        DepthAnythingV2 DPT head consumes."""
        B, H, W, _ = images.shape
        gh, gw = H // self.patch_size, W // self.patch_size

        images = images.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2,
                    strides=(self.patch_size,) * 2, padding="VALID",
                    name="patch_embed", dtype=self.dtype)(images)
        x = x.reshape(B, gh * gw, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim))
        reg_tokens = self.param("register_tokens", nn.initializers.zeros,
                                (1, self.num_register_tokens,
                                 self.embed_dim))
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + self.pos_embed_size**2, self.embed_dim))

        # interpolate the patch positional grid to (gh, gw)
        pos_cls = pos_embed[:, :1]
        pos_patch = pos_embed[:, 1:].reshape(
            1, self.pos_embed_size, self.pos_embed_size, self.embed_dim)
        if (gh, gw) != (self.pos_embed_size, self.pos_embed_size):
            pos_patch = interpolate_bilinear(pos_patch, (gh, gw),
                                             align_corners=False)
        pos_patch = pos_patch.reshape(1, gh * gw, self.embed_dim)

        x = x + pos_patch.astype(self.dtype)
        cls = jnp.broadcast_to((cls_token + pos_cls).astype(self.dtype),
                               (B, 1, self.embed_dim))
        regs = jnp.broadcast_to(reg_tokens.astype(self.dtype),
                                (B, self.num_register_tokens,
                                 self.embed_dim))
        x = jnp.concatenate([cls, regs, x], axis=1)

        norm = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=self.dtype)
        taps = []
        for i in range(self.depth):
            x = DinoBlock(self.embed_dim, self.num_heads,
                          name=f"blocks_{i}", dtype=self.dtype)(x)
            if i in return_layers:
                taps.append(norm(x)[:, 1 + self.num_register_tokens:])
        out = norm(x)[:, 1 + self.num_register_tokens:]
        if return_layers:
            return out, taps
        return out
