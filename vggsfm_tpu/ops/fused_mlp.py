"""Fused LayerNorm -> fc1 -> GELU -> fc2 -> +residual Pallas kernel.

Every transformer block in the tracker/camera formers ends with
``x + Mlp(LN(x))`` where the MLP widens 4x (384 -> 1536 -> 384). Under
XLA the (rows, 4C) intermediate roundtrips HBM between fc1 and fc2
(~100 MB per coarse-former block apply) and the LN runs as its own
pass; profiled marginal cost ~3.3 ms per block at the coarse shapes vs
~0.6 ms of flops+mandatory-traffic (tools/perf_probe_former.py). This
kernel keeps the hidden activations in VMEM: one read of x, one write
of the result, weights resident.

Numerics: LN statistics and both matmul accumulations in f32 (slightly
MORE precise than the XLA bf16 path, which casts fc1's output to bf16);
exact (erf) GELU, matching ``nn.gelu(approximate=False)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |err| < 1.5e-7 — Mosaic
    has no erf/erfc primitive; 1.5e-7 is far below bf16 activation
    noise and ~f32 roundoff for gelu's use."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[:]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=1, keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(h).astype(x.dtype)
    y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    y = y + b2_ref[0].astype(jnp.float32)
    o_ref[:] = (y + x32).astype(x.dtype)


def _attn_kernel(x_ref, wi_ref, bi_ref, wo_ref, bo_ref, o_ref, *,
                 L: int, H: int):
    x = x_ref[:]
    R, C = x.shape
    D = C // H
    TB = R // L
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=1, keepdims=True)
    xn32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn32.astype(x.dtype)
    qkv = jnp.dot(xn, wi_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bi_ref[0].astype(jnp.float32)).astype(x.dtype)
    q = qkv[:, :C]
    k = qkv[:, C:2 * C]
    v = qkv[:, 2 * C:]
    heads = []
    scale = 1.0 / (D ** 0.5)
    for h in range(H):
        qh = q[:, h * D:(h + 1) * D].reshape(TB, L, D)
        kh = k[:, h * D:(h + 1) * D].reshape(TB, L, D)
        vh = v[:, h * D:(h + 1) * D].reshape(TB, L, D)
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1).astype(x.dtype)
        oh = jax.lax.dot_general(p, vh, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        heads.append(oh.astype(x.dtype).reshape(R, D))
    att = jnp.concatenate(heads, axis=1)
    y = jnp.dot(att, wo_ref[:], preferred_element_type=jnp.float32)
    y = y + bo_ref[0].astype(jnp.float32)
    # residual base is the NORMALIZED input (reference applies norm1
    # in-place before the residual add — see models/layers.py)
    o_ref[:] = (xn32 + y).astype(x.dtype)


def _block_kernel(x_ref, wi_ref, bi_ref, wo_ref, bo_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, o_ref, *, L: int, H: int):
    """Whole pre-LN transformer block in one kernel: attention half
    (see _attn_kernel) feeding the MLP half (see _kernel) without the
    intermediate x1 ever leaving VMEM."""
    x = x_ref[:]
    R, C = x.shape
    D = C // H
    TB = R // L
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=1, keepdims=True)
    xn32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    xn = xn32.astype(x.dtype)
    qkv = jnp.dot(xn, wi_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bi_ref[0].astype(jnp.float32)).astype(x.dtype)
    q = qkv[:, :C]
    k = qkv[:, C:2 * C]
    v = qkv[:, 2 * C:]
    heads = []
    scale = 1.0 / (D ** 0.5)
    for h in range(H):
        qh = q[:, h * D:(h + 1) * D].reshape(TB, L, D)
        kh = k[:, h * D:(h + 1) * D].reshape(TB, L, D)
        vh = v[:, h * D:(h + 1) * D].reshape(TB, L, D)
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale, axis=-1).astype(x.dtype)
        oh = jax.lax.dot_general(p, vh, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        heads.append(oh.astype(x.dtype).reshape(R, D))
    att = jnp.concatenate(heads, axis=1)
    y = jnp.dot(att, wo_ref[:], preferred_element_type=jnp.float32)
    x1 = xn32 + y + bo_ref[0].astype(jnp.float32)  # f32 (R, C)
    # ---- MLP half on x1
    mean2 = jnp.mean(x1, axis=1, keepdims=True)
    var2 = jnp.mean(jnp.square(x1 - mean2), axis=1, keepdims=True)
    x1n = ((x1 - mean2) * jax.lax.rsqrt(var2 + 1e-6)).astype(x.dtype)
    hmid = jnp.dot(x1n, w1_ref[:], preferred_element_type=jnp.float32)
    hmid = hmid + b1_ref[0].astype(jnp.float32)
    hmid = _gelu_exact(hmid).astype(x.dtype)
    y2 = jnp.dot(hmid, w2_ref[:], preferred_element_type=jnp.float32)
    y2 = y2 + b2_ref[0].astype(jnp.float32)
    o_ref[:] = (x1 + y2).astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("seq_len", "num_heads", "block_rows",
                                    "interpret"))
def fused_transformer_block(x, w_in, b_in, w_out, b_out, w1, b1, w2, b2,
                            seq_len: int, num_heads: int,
                            block_rows: int | None = None,
                            interpret: bool = False):
    """One whole pre-LN transformer block (attention + MLP halves) as a
    single Pallas kernel — one HBM read and one write of x per block
    instead of two (see fused_ln_attn / fused_ln_mlp for the halves).
    Same layout contract as fused_ln_attn.
    """
    R, C = x.shape
    M = w1.shape[1]
    L = seq_len
    if block_rows is None:
        item = jnp.dtype(x.dtype).itemsize
        weights = (4 * C * C + 2 * C * M) * item
        per_row = C * (22 + 6 * item) + M * (4 + item)
        budget = max(11 * 2**20 - weights, 2**20)
        block_rows = 1 << max(7, min(11, (budget // per_row)
                                     .bit_length() - 1))
    # blocks must hold whole tracks AND keep the sublane dim divisible
    # by the dtype tile (16 covers bf16's (16, 128) and f32's (8, 128))
    # — step in lcm(L, 16) row units (e.g. L=25 frames -> 400-row
    # steps; plain multiples of 25 fail Pallas lowering)
    import math

    step = (L * 16) // math.gcd(L, 16)
    BR = max(step, (min(block_rows, R) // step) * step)
    pad = (-R) % BR
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Rp = R + pad
    dt = x.dtype
    kern = functools.partial(_block_kernel, L=L, H=num_heads)
    out = pl.pallas_call(
        kern,
        grid=(Rp // BR,),
        in_specs=[
            pl.BlockSpec((BR, C), lambda i: (i, 0)),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, M), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((M, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BR, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, C), dt),
        interpret=interpret,
    )(x, w_in.astype(dt), b_in.reshape(1, 3 * C).astype(dt),
      w_out.astype(dt), b_out.reshape(1, C).astype(dt),
      w1.astype(dt), b1.reshape(1, M).astype(dt),
      w2.astype(dt), b2.reshape(1, C).astype(dt))
    return out[:R] if pad else out


@functools.partial(jax.jit,
                   static_argnames=("seq_len", "num_heads", "block_rows",
                                    "interpret"))
def fused_ln_attn(x, w_in, b_in, w_out, b_out, seq_len: int,
                  num_heads: int, block_rows: int | None = None,
                  interpret: bool = False):
    """LN -> packed QKV -> per-track softmax attention -> out-proj ->
    +LN'd residual, fused into one kernel.

    Covers the self-attention half of a pre-LN transformer block for
    SHORT sequences: x is (B*seq_len, C) with each track's `seq_len`
    tokens contiguous (the update former's time-attention layout), and
    attention runs within each track only. The 48-wide head slices +
    per-head batched dots were feasibility-verified on-chip
    (tools/perf_probe_attn_kernel.py). f32 LN statistics, matmul
    accumulations, and softmax (torch-MHA parity).

    Args:
      x: (R, C), R a multiple of seq_len, C a multiple of 128.
      w_in (C, 3C), b_in (3C,): packed q|k|v projection.
      w_out (C, C), b_out (C,): output projection.
    """
    R, C = x.shape
    L = seq_len
    if block_rows is None:
        # resident weights + x/xn/qkv/att activations within ~12 MB VMEM
        item = jnp.dtype(x.dtype).itemsize
        weights = (3 * C * C + C * C) * item
        # per-row live set: x + f32 copy + f32 LN copy, the 3C-wide QKV
        # f32 accumulator + cast, att + f32 out-proj accumulator
        per_row = C * (22 + 6 * item)
        budget = max(11 * 2**20 - weights, 2**20)
        block_rows = 1 << max(7, min(11, (budget // per_row)
                                     .bit_length() - 1))
    import math

    step = (L * 16) // math.gcd(L, 16)  # see fused_transformer_block
    BR = max(step, (min(block_rows, R) // step) * step)
    pad = (-R) % BR
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Rp = R + pad
    dt = x.dtype
    kern = functools.partial(_attn_kernel, L=L, H=num_heads)
    out = pl.pallas_call(
        kern,
        grid=(Rp // BR,),
        in_specs=[
            pl.BlockSpec((BR, C), lambda i: (i, 0)),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BR, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, C), dt),
        interpret=interpret,
    )(x, w_in.astype(dt), b_in.reshape(1, 3 * C).astype(dt),
      w_out.astype(dt), b_out.reshape(1, C).astype(dt))
    return out[:R] if pad else out


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_ln_mlp(x, w1, b1, w2, b2, block_rows: int | None = None,
                 interpret: bool = False):
    """x + fc2(gelu(fc1(LN(x)))) with LN eps 1e-6, no LN affine.

    Args:
      x: (R, C) activations (bf16 or f32), C a multiple of 128.
      w1 (C, M), b1 (M,), w2 (M, C), b2 (C,): MLP parameters.

    Returns (R, C) in x.dtype.
    """
    R, C = x.shape
    M = w1.shape[1]
    if block_rows is None:
        # fit the resident weights + per-row activations (x + f32 copy,
        # hidden f32 + working copy, f32 output) in ~12 MB of the 16 MB
        # VMEM: the camera former's 768->3072 blocks OOMed a fixed
        # 1024-row block (16.33 MB scoped allocation)
        item = jnp.dtype(x.dtype).itemsize
        weights = 2 * C * M * item
        per_row = C * (8 + item) + M * (4 + item)
        budget = max(12 * 2**20 - weights, 2**20)
        block_rows = 1 << max(7, min(10, (budget // per_row)
                                     .bit_length() - 1))
    BR = min(block_rows, max(8, R))
    pad = (-R) % BR
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    Rp = R + pad
    dt = x.dtype
    out = pl.pallas_call(
        _kernel,
        grid=(Rp // BR,),
        in_specs=[
            pl.BlockSpec((BR, C), lambda i: (i, 0)),
            pl.BlockSpec((C, M), lambda i: (0, 0)),
            pl.BlockSpec((1, M), lambda i: (0, 0)),
            pl.BlockSpec((M, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BR, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Rp, C), dt),
        interpret=interpret,
    )(x, w1.astype(dt), b1.reshape(1, M).astype(dt),
      w2.astype(dt), b2.reshape(1, C).astype(dt))
    return out[:R] if pad else out
