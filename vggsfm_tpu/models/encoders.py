"""CNN feature encoders for the tracker (Flax, NHWC).

Parity: vggsfm/models/track_modules/blocks.py:25-183 —
`BasicEncoder`: stride-4 residual pyramid fused into a 128-d feature map
for coarse tracking; `ShallowEncoder`: tiny stride-1 net for 31x31 fine
patches. InstanceNorm is parameterless (torch affine=False), so the only
parameters are convolutions — ideal for direct checkpoint conversion
(transpose OIHW -> HWIO).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vggsfm_tpu.models.layers import ResidualBlock, instance_norm
from vggsfm_tpu.models.sampling import interpolate_bilinear


class BasicEncoder(nn.Module):
    """(B, H, W, 3) -> (B, H/stride, W/stride, output_dim)."""

    output_dim: int = 128
    stride: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, H, W, _ = x.shape
        d = self.output_dim
        x = x.astype(self.dtype)
        x = nn.Conv(d // 2, (7, 7), strides=(2, 2), padding=3,
                    name="conv1", dtype=self.dtype)(x)
        x = nn.relu(instance_norm(x))

        def layer(x, dim, stride, name):
            x = ResidualBlock(dim, stride, name=f"{name}_0",
                              dtype=self.dtype)(x)
            return ResidualBlock(dim, 1, name=f"{name}_1",
                                 dtype=self.dtype)(x)

        a = layer(x, d // 2, 1, "layer1")
        b = layer(a, d // 4 * 3, 2, "layer2")
        c = layer(b, d, 2, "layer3")
        e = layer(c, d, 2, "layer4")

        hw = (H // self.stride, W // self.stride)
        fused = jax.numpy.concatenate(
            [interpolate_bilinear(t, hw) for t in (a, b, c, e)], axis=-1)
        x = nn.Conv(d * 2, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(fused)
        x = nn.relu(instance_norm(x))
        return nn.Conv(d, (1, 1), name="conv3", dtype=self.dtype)(x)


class ShallowEncoder(nn.Module):
    """(B, H, W, 3) -> (B, H/stride, W/stride, output_dim), stride 1 default.

    With ``flat_cfirst`` the final upsample emits (B, output_dim, H'*W')
    channel-first-flat instead: the (B, 31, 31, 32) NHWC output tensor
    tiles its two minor dims to (8, 128) — a 4x padding expansion that
    made the fine stage's post-fnet layout copies its largest fixed cost
    (and OOMed the compiler at 32k patches). The flat form pads ~7%
    (961 -> 1024 lanes), and it is exactly the layout the fine corr
    pyramid consumes, so the downstream channels-first transpose
    disappears too. Weights are identical across both modes.
    """

    output_dim: int = 32
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, flat_cfirst: bool = False):
        _, H, W, _ = x.shape
        d = self.output_dim
        x = x.astype(self.dtype)
        x = nn.Conv(d, (3, 3), strides=(2, 2), padding=1, name="conv1",
                    dtype=self.dtype)(x)
        x = nn.relu(instance_norm(x))

        hw = x.shape[1:3]
        tmp = ResidualBlock(d, 2, name="layer1", dtype=self.dtype)(x)
        x = x + interpolate_bilinear(tmp, hw)
        tmp = ResidualBlock(d, 2, name="layer2", dtype=self.dtype)(tmp)
        x = x + interpolate_bilinear(tmp, hw)
        x = nn.Conv(d, (1, 1), name="conv2", dtype=self.dtype)(x) + x
        out_hw = (H // self.stride, W // self.stride)
        if not flat_cfirst:
            return interpolate_bilinear(x, out_hw)
        # fused upsample+transpose: one kron'd interpolation matrix
        # contracts the flattened source spatial axis — out (B, C, H'W')
        from vggsfm_tpu.models.sampling import _interp_matrix

        B, h, w, _ = x.shape
        My = _interp_matrix(h, out_hw[0], True, x.dtype)  # (H', h)
        Mx = _interp_matrix(w, out_hw[1], True, x.dtype)  # (W', w)
        M2 = jnp.einsum("oh,pw->ophw", My, Mx).reshape(
            out_hw[0] * out_hw[1], h * w)
        return jnp.einsum("bsc,os->bco", x.reshape(B, h * w, d), M2)
