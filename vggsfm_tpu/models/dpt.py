"""Monocular depth: DPT decoder over the DINOv2 backbone (Flax).

Parity target: the reference's optional dense-depth path loads
DepthAnythingV2 (vggsfm/runners/runner.py:141-162) — a DINOv2 encoder with
a DPT (dense prediction transformer) decoder producing relative disparity.
This module mirrors that architecture layer-for-layer so the public
DepthAnythingV2 checkpoints convert weight-faithfully
(models/convert.py:convert_depth_anything): per tapped ViT layer a 1x1
projection, a resize layer (transposed conv x4/x2, identity, stride-2
conv), and a bias-free 3x3 `layer_rn` conv; then coarse-to-fine fusion
through residual conv units; then the two-stage output head. With random
weights the module still exercises the full dense-depth pipeline
(alignment + export).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vggsfm_tpu.models.dinov2 import DinoVisionTransformer
from vggsfm_tpu.models.sampling import interpolate_bilinear


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1",
                    dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    """DPT refinenet: optional skip through rcu1, rcu2, upsample, 1x1 out.

    Matches DepthAnythingV2's FeatureFusionBlock (deconv=False,
    align_corners=True): `project` converts from `out_conv`.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1",
                                     dtype=self.dtype)(skip)
        x = ResidualConvUnit(self.features, name="rcu2",
                             dtype=self.dtype)(x)
        B, H, W, C = x.shape
        x = interpolate_bilinear(x, out_hw or (H * 2, W * 2))
        return nn.Conv(self.features, (1, 1), name="project",
                       dtype=self.dtype)(x)


class DPTHead(nn.Module):
    """Four tapped ViT layers -> disparity map at input resolution.

    Structure == DepthAnythingV2 DPTHead (use_clstoken=False): projects /
    resize_layers / scratch.layer*_rn / scratch.refinenet* /
    scratch.output_conv1+2, so checkpoints map 1:1.
    """

    features: int = 128
    out_channels: Sequence[int] = (96, 192, 384, 768)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps, grid_hw, out_hw):
        gh, gw = grid_hw
        # reassemble: project tokens, resize to 4 pyramid levels
        # (x4, x2, x1, /2 relative to the patch grid), then 3x3 layer_rn
        feats = []
        for i, t in enumerate(taps):
            B, P, C = t.shape
            x = t.reshape(B, gh, gw, C)
            x = nn.Conv(self.out_channels[i], (1, 1),
                        name=f"project_{i}", dtype=self.dtype)(x)
            if i == 0:
                x = nn.ConvTranspose(self.out_channels[i], (4, 4),
                                     strides=(4, 4), padding="VALID",
                                     name="resize_0", dtype=self.dtype)(x)
            elif i == 1:
                x = nn.ConvTranspose(self.out_channels[i], (2, 2),
                                     strides=(2, 2), padding="VALID",
                                     name="resize_1", dtype=self.dtype)(x)
            elif i == 3:
                x = nn.Conv(self.out_channels[i], (3, 3), strides=(2, 2),
                            padding=1, name="resize_3",
                            dtype=self.dtype)(x)
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        name=f"layer_rn_{i}", dtype=self.dtype)(x)
            feats.append(x)

        # fuse coarse -> fine (each step lands on the next level's grid)
        x = FeatureFusionBlock(self.features, name="fusion_3",
                               dtype=self.dtype)(
            feats[3], out_hw=feats[2].shape[1:3])
        x = FeatureFusionBlock(self.features, name="fusion_2",
                               dtype=self.dtype)(
            x, feats[2], out_hw=feats[1].shape[1:3])
        x = FeatureFusionBlock(self.features, name="fusion_1",
                               dtype=self.dtype)(
            x, feats[1], out_hw=feats[0].shape[1:3])
        x = FeatureFusionBlock(self.features, name="fusion_0",
                               dtype=self.dtype)(x, feats[0])

        x = nn.Conv(self.features // 2, (3, 3), padding=1,
                    name="head_conv1", dtype=self.dtype)(x)
        x = interpolate_bilinear(x, out_hw)
        x = nn.relu(nn.Conv(32, (3, 3), padding=1, name="head_conv2",
                            dtype=self.dtype)(x))
        x = nn.Conv(1, (1, 1), name="head_conv3", dtype=self.dtype)(x)
        return nn.relu(x.astype(jnp.float32))[..., 0]  # disparity >= 0


class DepthAnything(nn.Module):
    """DINOv2 + DPT: (B, H, W, 3) in [0, 1] -> relative disparity (B, H, W).

    Defaults are ViT-B taps (cheap); `DepthAnything.vitl()` builds the
    configuration of the public DepthAnythingV2-Large checkpoint the
    reference downloads (runner.py:147-158).
    """

    tap_layers: Sequence[int] = (2, 5, 8, 11)  # ViT-B
    features: int = 128
    out_channels: Sequence[int] = (96, 192, 384, 768)
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    num_register_tokens: int = 4
    dtype: Any = jnp.float32

    @classmethod
    def vitl(cls, dtype=jnp.float32):
        return cls(tap_layers=(4, 11, 17, 23), features=256,
                   out_channels=(256, 512, 1024, 1024), embed_dim=1024,
                   depth=24, num_heads=16, num_register_tokens=0,
                   dtype=dtype)

    @nn.compact
    def __call__(self, images):
        from vggsfm_tpu.models.camera import _RESNET_MEAN, _RESNET_STD

        B, H, W, _ = images.shape
        # pad to patch multiples
        ph = (-H) % 14
        pw = (-W) % 14
        x = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    mode="edge")
        x = (x - _RESNET_MEAN) / _RESNET_STD
        backbone = DinoVisionTransformer(
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads,
            num_register_tokens=self.num_register_tokens,
            dtype=self.dtype, name="backbone")
        _, taps = backbone(x, return_layers=tuple(self.tap_layers))
        gh, gw = (H + ph) // 14, (W + pw) // 14
        disp = DPTHead(self.features, self.out_channels, dtype=self.dtype,
                       name="head")(taps, (gh, gw), (H + ph, W + pw))
        return disp[:, :H, :W]
