"""Fused Pallas transformer kernels vs reference jnp math.

Runs the kernels in interpret mode (CPU) against hand-written reference
implementations of the exact block math (LN eps 1e-6 without affine,
packed QKV, f32 softmax, exact-erf GELU, LN'd-residual convention).
The on-TPU lowering is exercised by the benchmark and the L-sweep in
the round-5 commit history; these tests pin the NUMERICS and the
odd-shape handling (padding, non-multiple-of-8 track counts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.ops.fused_mlp import (
    fused_ln_attn,
    fused_ln_mlp,
    fused_transformer_block,
)


def _ln(x):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-6)


def _mk(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.05)


def _attn_ref(x, wi, bi, wo, bo, L, H):
    R, C = x.shape
    B, D = R // L, C // H
    xn = _ln(x)
    qkv = xn @ wi + bi
    q, k, v = jnp.split(qkv, 3, -1)
    qh = q.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhld,bhmd->bhlm", qh, kh) / (D ** 0.5)
    p = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhlm,bhmd->bhld", p, vh)
    o = o.transpose(0, 2, 1, 3).reshape(R, C)
    return xn + o @ wo + bo


def _mlp_ref(x, w1, b1, w2, b2):
    return x + (jax.nn.gelu(_ln(x) @ w1 + b1, approximate=False) @ w2
                + b2)


class TestFusedKernels:
    def test_mlp_matches_reference(self, rng):
        x = _mk(rng, 1000, 384) * 20  # odd row count -> padding path
        w1, b1 = _mk(rng, 384, 1536), _mk(rng, 1536)
        w2, b2 = _mk(rng, 1536, 384), _mk(rng, 384)
        out = fused_ln_mlp(x, w1, b1, w2, b2, interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_mlp_ref(x, w1, b1, w2, b2)),
                                   atol=2e-5)

    @pytest.mark.parametrize("L", [8, 25, 9])
    def test_attn_matches_reference(self, rng, L):
        C, H = 256, 8
        x = _mk(rng, 40 * L, C) * 20
        wi, bi = _mk(rng, C, 3 * C), _mk(rng, 3 * C)
        wo, bo = _mk(rng, C, C), _mk(rng, C)
        out = fused_ln_attn(x, wi, bi, wo, bo, L, H, interpret=True)
        ref = _attn_ref(x, wi, bi, wo, bo, L, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_block_matches_composed_halves(self, rng):
        L, C, H, M = 8, 384, 8, 1536
        x = _mk(rng, 64 * L, C) * 20
        wi, bi = _mk(rng, C, 3 * C), _mk(rng, 3 * C)
        wo, bo = _mk(rng, C, C), _mk(rng, C)
        w1, b1 = _mk(rng, C, M), _mk(rng, M)
        w2, b2 = _mk(rng, M, C), _mk(rng, C)
        one = fused_transformer_block(x, wi, bi, wo, bo, w1, b1, w2, b2,
                                      L, H, interpret=True)
        x1 = _attn_ref(x, wi, bi, wo, bo, L, H)
        two = _mlp_ref(x1, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(one), np.asarray(two),
                                   atol=5e-5)

    def test_attn_block_module_fallback_consistency(self, rng):
        """AttnBlock's CPU jnp fallback equals the kernel math (the TPU
        path was verified on-chip; this pins the shared reference)."""
        from vggsfm_tpu.models.layers import AttnBlock

        x = _mk(rng, 16, 8, 384) * 20
        blk = AttnBlock(384, 8)
        params = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(params, x)
        p = params["params"]
        x1 = _attn_ref(x.reshape(-1, 384),
                       p["attn"]["in_proj"]["kernel"],
                       p["attn"]["in_proj"]["bias"],
                       p["attn"]["out_proj"]["kernel"],
                       p["attn"]["out_proj"]["bias"], 8, 8)
        ref = _mlp_ref(x1, p["mlp"]["fc1"]["kernel"],
                       p["mlp"]["fc1"]["bias"],
                       p["mlp"]["fc2"]["kernel"],
                       p["mlp"]["fc2"]["bias"]).reshape(16, 8, 384)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5)
