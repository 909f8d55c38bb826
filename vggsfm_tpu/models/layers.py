"""Shared NN building blocks (Flax, channels-last).

Parity: vggsfm/models/modules.py (ResidualBlock :39-116, Mlp :119-154,
AttnBlock :157-204, CrossAttnBlock :207-253). Notable behavioral quirks kept
for weight-compatibility:
  * AttnBlock/CrossAttnBlock use the *normalized* input as the residual base
    (the reference applies norm1 in-place before the residual add);
  * attention norms have no affine parameters (elementwise_affine=False);
  * the attention is torch-`nn.MultiheadAttention`-shaped: packed QKV
    projection + output projection, so converted checkpoints map 1:1.
"""

from __future__ import annotations

from typing import Any

import os

import flax.linen as nn
import jax
import jax.numpy as jnp


def _fused_former_enabled() -> bool:
    """Fused former-block Pallas kernels run on TPU unless disabled with
    VGGSFM_FUSED_FORMER=0 (numerics A/B / debugging escape hatch)."""
    return (jax.default_backend() == "tpu"
            and os.environ.get("VGGSFM_FUSED_FORMER", "1") != "0")

Dtype = Any


class TorchMultiheadAttention(nn.Module):
    """Multi-head attention matching torch.nn.MultiheadAttention layout.

    Parameters: `in_proj` Dense(3*dim) (packed q|k|v) and `out_proj` —
    both declared as dict-valued params at the exact nn.Dense paths, so
    checkpoints convert identically while the raw arrays stay available
    for the fused self-attention Pallas path. Inputs are (B, L, C)
    (batch_first).
    """

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def _params(self, in_dim):
        def mk(key, shape, dt):
            return {"kernel": nn.initializers.lecun_normal()(
                        key, shape, dt),
                    "bias": jnp.zeros((shape[1],), dt)}

        w = self.param("in_proj", mk, (in_dim, 3 * self.dim), jnp.float32)
        wo = self.param("out_proj", mk, (self.dim, self.dim), jnp.float32)
        return w, wo

    def __call__(self, q, k, v, fused_ln_self: bool = False):
        """Standard MHA — or, with ``fused_ln_self`` (self-attention
        only), the whole pre-LN attention half ``LN(x) + out_proj(
        attn(LN(x)))`` as one Pallas kernel (q is the RAW block input;
        k/v are ignored). Falls back to the reference jnp path off-TPU
        or for long sequences."""
        H = self.num_heads
        D = self.dim // H
        w, wo = self._params(q.shape[-1])
        kernel = w["kernel"].astype(self.dtype)
        bias = w["bias"].astype(self.dtype)
        out_k = wo["kernel"].astype(self.dtype)
        out_b = wo["bias"].astype(self.dtype)

        def plain(q, k, v):
            # packed q|k|v projection applied via explicit kernel SLICES
            # so cross attention only computes the projections it uses
            # (calling the full Dense on q, k, and v separately tripled
            # the projection FLOPs on the large token set)
            def proj(x, lo, hi):
                return x @ kernel[:, lo:hi] + bias[lo:hi]

            if q is k and k is v:
                xq, xk, xv = jnp.split(proj(q, 0, 3 * self.dim), 3,
                                       axis=-1)
            else:
                xq = proj(q, 0, self.dim)
                xk = proj(k, self.dim, 2 * self.dim)
                xv = proj(v, 2 * self.dim, 3 * self.dim)

            # attention in (B, L, H, D) layout end-to-end: the head axis
            # is a dot_general batch dim, so no materialized head-split/
            # merge transposes (they showed up as ~64 ms of pure copies
            # per coarse call in the profiler trace)
            def split_heads(x):
                B, L, _ = x.shape
                return x.reshape(B, L, H, D)

            xq, xk, xv = split_heads(xq), split_heads(xk), split_heads(xv)
            # softmax in f32 for numerical stability under low precision
            attn = jnp.einsum("bqhd,bkhd->bhqk", xq, xk).astype(
                jnp.float32)
            attn = jax.nn.softmax(attn / jnp.sqrt(D), axis=-1).astype(
                xv.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, xv)
            B, L = out.shape[0], out.shape[1]
            out = out.reshape(B, L, self.dim)
            return out @ out_k + out_b

        if not fused_ln_self:
            return plain(q, k, v)

        B, L, C = q.shape
        # resident-weight fit: at f32 (the camera former's tokens promote
        # to f32 via the sincos pos-embed) a 768-wide block's weights
        # alone exceed the 16 MB VMEM — fall back to the jnp path then
        weights_bytes = (kernel.size + out_k.size) * q.dtype.itemsize
        # L % 8: Mosaic's in-kernel (rows, D) -> (TB, L, D) reshape
        # needs a sublane-aligned L (odd frame counts fall back)
        if _fused_former_enabled() and C % 128 == 0 and L <= 64 \
                and L % 8 == 0 and weights_bytes <= 11 * 2**20:
            from vggsfm_tpu.ops.fused_mlp import fused_ln_attn

            return fused_ln_attn(
                q.reshape(B * L, C), kernel, bias, out_k, out_b,
                L, H).reshape(B, L, C)
        # reference path: LN then self-attention then LN'd residual
        x32 = q.astype(jnp.float32)
        mean = jnp.mean(x32, -1, keepdims=True)
        var = jnp.var(x32, -1, keepdims=True)
        xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(q.dtype)
        return xn + plain(xn, xn, xn)


class Mlp(nn.Module):
    """Linear -> GELU -> Linear (timm-style). Parity: modules.py:119-154.

    Params are declared as dict-valued leaves with the exact
    ``fc1/{kernel,bias}`` / ``fc2/{kernel,bias}`` paths nn.Dense would
    create (same trick as TorchMultiheadAttention's packed ``in_proj``),
    so checkpoints convert identically — while the raw arrays stay
    accessible for the fused LN+MLP+residual Pallas path.
    """

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def _params(self, in_dim):
        def mk(key, shape, dt):
            return {"kernel": nn.initializers.lecun_normal()(
                        key, shape, dt),
                    "bias": jnp.zeros((shape[1],), dt)}

        fc1 = self.param("fc1", mk, (in_dim, self.hidden_features),
                         jnp.float32)
        fc2 = self.param("fc2", mk, (self.hidden_features,
                                     self.out_features), jnp.float32)
        return fc1, fc2

    def __call__(self, x, ln_residual: bool = False):
        """Plain MLP — or, with ``ln_residual``, the whole transformer
        tail ``x + fc2(gelu(fc1(LN(x))))`` (LN eps 1e-6, no affine),
        fused into one Pallas kernel on TPU (the (rows, 4C) hidden
        activations never touch HBM; see ops/fused_mlp.py)."""
        fc1, fc2 = self._params(x.shape[-1])
        k1 = fc1["kernel"].astype(self.dtype)
        b1 = fc1["bias"].astype(self.dtype)
        k2 = fc2["kernel"].astype(self.dtype)
        b2 = fc2["bias"].astype(self.dtype)
        if not ln_residual:
            h = nn.gelu(x @ k1 + b1, approximate=False)
            return h @ k2 + b2
        lead = x.shape[:-1]
        C = x.shape[-1]
        x2 = x.reshape(-1, C)
        # resident-weight fit: f32 tokens (camera former) with M = 3072
        # put ~19 MB of weights in VMEM — jnp fallback there
        weights_bytes = (k1.size + k2.size) * x.dtype.itemsize
        if _fused_former_enabled() and C % 128 == 0 \
                and self.hidden_features % 128 == 0 \
                and weights_bytes <= 11 * 2**20:
            from vggsfm_tpu.ops.fused_mlp import fused_ln_mlp

            return fused_ln_mlp(x2, k1, b1, k2, b2).reshape(
                lead + (self.out_features,))
        mean = jnp.mean(x2.astype(jnp.float32), -1, keepdims=True)
        var = jnp.var(x2.astype(jnp.float32), -1, keepdims=True)
        xn = ((x2 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
        h = nn.gelu(xn @ k1 + b1, approximate=False)
        return (x2 + (h @ k2 + b2)).reshape(lead + (self.out_features,))


class AttnBlock(nn.Module):
    """Pre-LN self-attention + MLP. Parity: modules.py:157-204."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # the whole block runs as ONE fused Pallas kernel on TPU (norm1 +
        # QKV + attention + out-proj + residual + norm2 + MLP + residual
        # — x makes a single HBM round trip); the parameterless norms
        # fold in, so the param tree is unchanged. Off-TPU / long-
        # sequence / oversized-weight cases fall back to the two
        # fused halves, which themselves fall back to plain jnp.
        attn_mod = TorchMultiheadAttention(
            self.hidden_size, self.num_heads, name="attn",
            dtype=self.dtype)
        mlp_mod = Mlp(int(self.hidden_size * self.mlp_ratio),
                      self.hidden_size, name="mlp", dtype=self.dtype)
        C = x.shape[-1]
        M = int(self.hidden_size * self.mlp_ratio)
        if x.ndim == 3 and _fused_former_enabled() \
                and C % 128 == 0 and M % 128 == 0 and x.shape[1] <= 64 \
                and x.shape[1] % 8 == 0 \
                and (4 * C * C + 2 * C * M) * x.dtype.itemsize \
                    <= 11 * 2**20:
            w, wo = attn_mod._params(C)
            fc1, fc2 = mlp_mod._params(C)
            from vggsfm_tpu.ops.fused_mlp import fused_transformer_block

            B, L, _ = x.shape
            dt = self.dtype
            return fused_transformer_block(
                x.reshape(B * L, C),
                w["kernel"].astype(dt), w["bias"].astype(dt),
                wo["kernel"].astype(dt), wo["bias"].astype(dt),
                fc1["kernel"].astype(dt), fc1["bias"].astype(dt),
                fc2["kernel"].astype(dt), fc2["bias"].astype(dt),
                L, self.num_heads).reshape(B, L, C)
        x = attn_mod(x, x, x, fused_ln_self=True)
        return mlp_mod(x, ln_residual=True)


class CrossAttnBlock(nn.Module):
    """Cross-attention block. Parity: modules.py:207-253."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="norm1", dtype=self.dtype)(x)
        context = nn.LayerNorm(epsilon=1e-5, name="norm_context",
                               dtype=self.dtype)(context)
        x = x + TorchMultiheadAttention(
            self.hidden_size, self.num_heads, name="cross_attn",
            dtype=self.dtype)(x, context, context)
        return Mlp(int(self.hidden_size * self.mlp_ratio),
                   self.hidden_size, name="mlp", dtype=self.dtype)(
                       x, ln_residual=True)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Parameterless InstanceNorm over spatial dims, NHWC.

    torch nn.InstanceNorm2d defaults to affine=False — it is pure
    normalization (modules.py uses it throughout the encoders). Statistics
    are computed in f32 regardless of the activation dtype.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
    var = jnp.var(x32, axis=(-3, -2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ResidualBlock(nn.Module):
    """Two 3x3 convs with residual + optional strided 1x1 downsample.

    Parity: modules.py:39-116 (norm_fn='instance' is the only mode used by
    the encoders, which is parameterless).
    """

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=1, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2",
                    dtype=self.dtype)(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        name="downsample", dtype=self.dtype)(x)
            x = instance_norm(x)
        return nn.relu(x + y)


def group_norm_1(x: jax.Array, scale: jax.Array, bias: jax.Array,
                 eps: float = 1e-5) -> jax.Array:
    """GroupNorm(num_groups=1) over the channel axis with affine params."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
