"""Monocular depth: DPT decoder over the DINOv2 backbone (Flax).

Parity target: the reference's optional dense-depth path loads
DepthAnythingV2 (vggsfm/runners/runner.py:141-162) — a DINOv2 encoder with
a DPT (dense prediction transformer) decoder producing relative disparity.
This is that architecture: four intermediate ViT layers are projected,
reshaped to feature maps at 4 scales, fused coarse-to-fine through
residual conv units, and decoded to a single-channel disparity map.
Weights convert from the public checkpoints with the same conv/Dense
mappings as the rest of vggsfm_tpu.models.convert; with random weights the
module still exercises the full dense-depth pipeline (alignment + export).
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
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, out_hw=None):
        if skip is not None:
            x = interpolate_bilinear(x, skip.shape[1:3])
            x = x + ResidualConvUnit(self.features, name="rcu1",
                                     dtype=self.dtype)(skip)
        x = ResidualConvUnit(self.features, name="rcu2",
                             dtype=self.dtype)(x)
        B, H, W, C = x.shape
        x = interpolate_bilinear(x, out_hw or (H * 2, W * 2))
        return nn.Conv(self.features, (1, 1), name="project",
                       dtype=self.dtype)(x)


class DPTHead(nn.Module):
    """Four tapped ViT layers -> disparity map at input resolution."""

    features: int = 128
    out_channels: Sequence[int] = (96, 192, 384, 768)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, taps, grid_hw, out_hw):
        gh, gw = grid_hw
        # reassemble: project tokens and rescale to 4 pyramid levels
        # (strides 4, 8, 16, 32 relative to patches x4)
        scales = (4, 2, 1, 0.5)
        feats = []
        for i, t in enumerate(taps):
            B, P, C = t.shape
            x = t.reshape(B, gh, gw, C)
            x = nn.Conv(self.out_channels[i], (1, 1),
                        name=f"project_{i}", dtype=self.dtype)(x)
            th, tw = int(gh * scales[i]), int(gw * scales[i])
            x = interpolate_bilinear(x, (th, tw))
            x = nn.Conv(self.features, (3, 3), padding=1,
                        name=f"resize_{i}", dtype=self.dtype)(x)
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
    """DINOv2 + DPT: (B, H, W, 3) in [0, 1] -> relative disparity (B, H, W)."""

    tap_layers: Sequence[int] = (2, 5, 8, 11)  # ViT-B
    features: int = 128
    dtype: Any = jnp.float32

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
        backbone = DinoVisionTransformer(dtype=self.dtype, name="backbone")
        _, taps = backbone(x, return_layers=tuple(self.tap_layers))
        gh, gw = (H + ph) // 14, (W + pw) // 14
        disp = DPTHead(self.features, dtype=self.dtype, name="head")(
            taps, (gh, gw), (H + ph, W + pw))
        return disp[:, :H, :W]
