"""ALIKED keypoint detector — score branch + SDDH descriptors (Flax).

The reference's default query-point source is LightGlue's ALIKED wrapper
(cfgs/demo.yaml:49 `query_method: aliked`, runners/runner.py:1374-1379).
For query points only the *score map* matters (the tracker does the
matching), so the hot path ports ALIKED's encoder + score head: a 4-stage
conv/residual pyramid whose stage outputs are projected to dim/4 channels,
upsampled to input resolution, concatenated, and reduced to a single-channel
score map; keypoints are NMS peaks of that map.

The SDDH (Sparse Deformable Descriptor Head, ALIKED paper arXiv
2304.03608) completes the reference's extractor surface: per keypoint,
a small conv predicts `n_pos` deformable sample offsets from the local
k x k feature patch; features bilinearly sampled at keypoint+offset are
projected (sf_conv), aggregated over positions (convM) and L2-normalized
into a `dim`-d descriptor. TPU-first: all keypoints batch through one
gather + three 1x1 convs (static shapes, no per-keypoint loop).

BatchNorm layers are represented in inference form (per-channel scale +
bias, foldable from a torch checkpoint's running statistics).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from vggsfm_tpu.models.sampling import bilinear_sample, interpolate_bilinear


class InferenceBatchNorm(nn.Module):
    """Frozen BatchNorm: y = x * scale + bias (folded running stats)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class ConvBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv1",
                    dtype=self.dtype)(x)
        x = jax.nn.selu(InferenceBatchNorm(self.features, name="bn1")(x))
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(x)
        return jax.nn.selu(InferenceBatchNorm(self.features, name="bn2")(x))


class ResBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32
    # the official ALIKED passes a 1x1-conv downsample to every ResBlock,
    # even when in/out channels match — keep it so converted weights align
    force_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv1",
                    dtype=self.dtype)(x)
        y = jax.nn.selu(InferenceBatchNorm(self.features, name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(y)
        y = InferenceBatchNorm(self.features, name="bn2")(y)
        if self.force_downsample or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), name="downsample",
                        dtype=self.dtype)(x)
        return jax.nn.selu(x + y)


class SDDH(nn.Module):
    """Sparse Deformable Descriptor Head (ALIKED, arXiv 2304.03608).

    Per keypoint: a k x k feature patch predicts `n_pos` 2D sample
    offsets (two convs; the k x k VALID conv on a k x k patch is a dense
    map over the patch); features bilinearly sampled at keypoint+offset
    are projected by a 1x1 conv (sf_conv), concatenated over positions
    (position-major, matching `permute(0, 2, 1).reshape` in the torch
    replica) and reduced by convM to a `dim`-d L2-normalized descriptor.
    All keypoints batch through one gather — no per-keypoint loop.
    """

    dim: int = 128
    kernel_size: int = 3
    n_pos: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap, keypoints):
        """fmap (B, H, W, C), keypoints (B, N, 2) xy pixel coords ->
        descriptors (B, N, dim), offsets (B, N, n_pos, 2)."""
        B, H, W, C = fmap.shape
        N = keypoints.shape[1]
        k, P = self.kernel_size, self.n_pos

        # 1. k x k patches centered on the rounded keypoint (border clamp)
        ctr = jnp.round(keypoints).astype(jnp.int32)  # (B, N, 2) xy
        half = k // 2
        dy, dx = jnp.meshgrid(jnp.arange(-half, half + 1),
                              jnp.arange(-half, half + 1), indexing="ij")
        px = jnp.clip(ctr[..., 0, None, None] + dx, 0, W - 1)
        py = jnp.clip(ctr[..., 1, None, None] + dy, 0, H - 1)
        flat = fmap.reshape(B, H * W, C)
        idx = (py * W + px).reshape(B, N * k * k)
        patches = jnp.take_along_axis(flat, idx[..., None], axis=1)
        patches = patches.reshape(B * N, k, k, C)

        # 2. offsets: k x k VALID conv -> selu -> 1x1 conv, clamped to the
        # official max_offset = max(H, W) / 4
        off = nn.Conv(2 * P, (k, k), padding="VALID", name="offset_conv1",
                      dtype=self.dtype)(patches)
        off = nn.Conv(2 * P, (1, 1), name="offset_conv2",
                      dtype=self.dtype)(jax.nn.selu(off))
        max_off = max(H, W) / 4.0
        offsets = jnp.clip(off.reshape(B, N, P, 2), -max_off, max_off)

        # 3. deformable sampling at keypoint + offset
        pos = keypoints[:, :, None, :] + offsets  # (B, N, P, 2)
        sampled = bilinear_sample(fmap, pos)  # (B, N, P, C)

        # 4. project, aggregate over positions, normalize
        h = jax.nn.selu(nn.Conv(C, (1, 1), use_bias=False, name="sf_conv",
                                dtype=self.dtype)(sampled))
        h = h.reshape(B, N, 1, P * C)  # position-major concat
        desc = nn.Conv(self.dim, (1, 1), use_bias=False, name="convM",
                       dtype=self.dtype)(h)[:, :, 0, :]
        desc = desc.astype(jnp.float32)
        desc = desc / jnp.maximum(
            jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
        return desc, offsets


class ALIKED(nn.Module):
    """ALIKED-n16-style encoder + score head -> (B, H, W) score map."""

    c1: int = 16
    c2: int = 32
    c3: int = 64
    c4: int = 128
    dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, return_feats: bool = False):
        """(B, H, W, 3) in [0, 1] -> score map (B, H, W) in [0, 1].

        With `return_feats` also returns the (B, H, W, dim) fused feature
        map the SDDH descriptor head samples from.

        Stage resolutions follow the official ALIKED-n16: 1, /2, /8, /32
        (pool2 once, then pool4 twice) so converted weights see the same
        receptive fields.
        """
        B, H, W, _ = image.shape
        x1 = ConvBlock(self.c1, name="block1", dtype=self.dtype)(image)
        x2 = nn.avg_pool(x1, (2, 2), strides=(2, 2))
        x2 = ResBlock(self.c2, name="block2", dtype=self.dtype,
                      force_downsample=True)(x2)
        x3 = nn.avg_pool(x2, (4, 4), strides=(4, 4))
        x3 = ResBlock(self.c3, name="block3", dtype=self.dtype,
                      force_downsample=True)(x3)
        x4 = nn.avg_pool(x3, (4, 4), strides=(4, 4))
        x4 = ResBlock(self.c4, name="block4", dtype=self.dtype,
                      force_downsample=True)(x4)

        d = self.dim // 4
        f1 = jax.nn.selu(nn.Conv(d, (1, 1), name="conv1",
                                 dtype=self.dtype)(x1))
        f2 = jax.nn.selu(nn.Conv(d, (1, 1), name="conv2",
                                 dtype=self.dtype)(x2))
        f3 = jax.nn.selu(nn.Conv(d, (1, 1), name="conv3",
                                 dtype=self.dtype)(x3))
        f4 = jax.nn.selu(nn.Conv(d, (1, 1), name="conv4",
                                 dtype=self.dtype)(x4))
        feats = jnp.concatenate([
            f1,
            interpolate_bilinear(f2, (H, W)),
            interpolate_bilinear(f3, (H, W)),
            interpolate_bilinear(f4, (H, W)),
        ], axis=-1)

        s = jax.nn.selu(nn.Conv(8, (1, 1), name="score_head1",
                                dtype=self.dtype)(feats))
        s = jax.nn.selu(nn.Conv(4, (3, 3), padding=1, name="score_head2",
                                dtype=self.dtype)(s))
        s = jax.nn.selu(nn.Conv(4, (3, 3), padding=1, name="score_head3",
                                dtype=self.dtype)(s))
        s = nn.Conv(1, (3, 3), padding=1, name="score_head4",
                    dtype=self.dtype)(s)
        score = jax.nn.sigmoid(s.astype(jnp.float32))[..., 0]
        if return_feats:
            return score, feats
        return score


def convert_aliked_checkpoint(state_dict) -> dict:
    """Official ALIKED(-n16) torch state_dict -> Flax params.

    Maps `block1..block4` (ConvBlock / torchvision-style ResBlock with a
    plain 1x1-conv downsample), the `conv1..conv4` 1x1 projections, and the
    `score_head.{0,2,4,6}` Sequential. BatchNorm running statistics are
    folded into InferenceBatchNorm (scale, bias). SDDH / descriptor keys
    are ignored (score branch only).
    """
    import numpy as np

    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}

    def arr(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    def conv(prefix, bias=True):
        out = {"kernel": arr(f"{prefix}.weight").transpose(2, 3, 1, 0)}
        if f"{prefix}.bias" in sd:
            out["bias"] = arr(f"{prefix}.bias")
        else:
            out["bias"] = np.zeros(out["kernel"].shape[-1], np.float32)
        return out

    def bn(prefix, eps=1e-5):
        scale = arr(f"{prefix}.weight") / np.sqrt(
            arr(f"{prefix}.running_var") + eps)
        bias = arr(f"{prefix}.bias") - arr(f"{prefix}.running_mean") * scale
        return {"scale": scale.astype(np.float32),
                "bias": bias.astype(np.float32)}

    def block(prefix, has_down):
        p = {"conv1": conv(f"{prefix}.conv1"),
             "bn1": bn(f"{prefix}.bn1"),
             "conv2": conv(f"{prefix}.conv2"),
             "bn2": bn(f"{prefix}.bn2")}
        if has_down and f"{prefix}.downsample.weight" in sd:
            p["downsample"] = conv(f"{prefix}.downsample")
        return p


    params = {
        "block1": block("block1", False),
        "block2": block("block2", True),
        "block3": block("block3", True),
        "block4": block("block4", True),
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
        "conv3": conv("conv3"),
        "conv4": conv("conv4"),
        "score_head1": conv("score_head.0"),
        "score_head2": conv("score_head.2"),
        "score_head3": conv("score_head.4"),
        "score_head4": conv("score_head.6"),
    }
    return {"params": params}


def convert_sddh_checkpoint(state_dict, prefix: str = "desc_head") -> dict:
    """Official ALIKED `desc_head` (SDDH) subtree -> Flax SDDH params.

    offset_conv Sequential{0: k x k conv, 1: selu, 2: 1x1 conv}, the
    bias-free sf_conv / convM 1x1 convs. convM's input-channel order is
    position-major (descriptor positions outer, feature channels inner) —
    the same order our forward concatenates.
    """
    import numpy as np

    sd = {k.removeprefix("module."): v for k, v in state_dict.items()}

    def arr(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    def conv(p, bias=True):
        out = {"kernel": arr(f"{p}.weight").transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = arr(f"{p}.bias")
        return out

    return {"params": {
        "offset_conv1": conv(f"{prefix}.offset_conv.0"),
        "offset_conv2": conv(f"{prefix}.offset_conv.2"),
        "sf_conv": conv(f"{prefix}.sf_conv", bias=False),
        "convM": conv(f"{prefix}.convM", bias=False),
    }}
