"""Microbench the update-former block at coarse shapes (real TPU).

The r5 trace shows each time-attention block's QKV fusion at ~0.8 ms for
1.8 GFLOP (~1% MXU) and (4160, 8, 1536) MLP intermediates roundtripping
HBM. Variants measured here:
  a) AttnBlock as-is on (4160, 8, 384);
  b) tokens flattened to 2D before the block-internal projections
     (layout experiment — does XLA pick better tilings for (33280, C)?);
  c) the full 6-block time stack, to estimate per-coarse-call cost.

Usage: python tools/perf_probe_former.py  (never concurrent on the TPU)
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.layers import AttnBlock

    def sync(x):
        leaves = [v for v in jax.tree.leaves(x) if hasattr(v, "shape")]
        return np.asarray(leaves[0].ravel()[0])

    def timeit(label, fn, reps=3):
        fn()
        sync(fn())
        ts = []
        for _ in range(reps):
            t0 = time.time()
            sync(fn())
            ts.append(time.time() - t0)
        print(f"{label:44s} {min(ts)*1e3:9.2f} ms", flush=True)
        return min(ts)

    rng = np.random.default_rng(0)
    B, L, C = 4160, 8, 384
    x = jnp.asarray(rng.normal(size=(B, L, C)), jnp.bfloat16)
    blk = AttnBlock(C, 8, dtype=jnp.bfloat16)
    params = blk.init(jax.random.PRNGKey(0), x)

    f1 = jax.jit(lambda p, x: blk.apply(p, x))
    timeit("AttnBlock (4160,8,384) x1", lambda: f1(params, x))

    def stack6(p, x):
        for _ in range(6):
            x = blk.apply(p, x)
        return x

    f6 = jax.jit(stack6)
    timeit("AttnBlock x6 (shared params)", lambda: f6(params, x))

    # 2D-flattened variant of the same math (LN/proj/MLP on (B*L, C),
    # attention still (B, L, C))
    from vggsfm_tpu.models.layers import Mlp, TorchMultiheadAttention

    attn = TorchMultiheadAttention(C, 8, dtype=jnp.bfloat16)
    mlp = Mlp(4 * C, C, dtype=jnp.bfloat16)

    ap = {"params": params["params"]["attn"]}
    mp = {"params": params["params"]["mlp"]}

    def ln(x):
        m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
        v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
        return ((x - m) * jax.lax.rsqrt(v + 1e-6)).astype(x.dtype)

    def flat_block(ap, mp, x):
        B, L, C = x.shape
        xn = ln(x)
        att = attn.apply(ap, xn, xn, xn)
        x1 = xn + att
        y = ln(x1.reshape(B * L, C))
        return (x1.reshape(B * L, C) + mlp.apply(mp, y)).reshape(B, L, C)

    ff = jax.jit(flat_block)
    timeit("flat-proj variant x1", lambda: ff(ap, mp, x))

    def flat6(ap, mp, x):
        for _ in range(6):
            x = flat_block(ap, mp, x)
        return x

    ff6 = jax.jit(flat6)
    timeit("flat-proj variant x6", lambda: ff6(ap, mp, x))

    # raw matmul reference: what the hardware gives for the same GEMMs
    W = jnp.asarray(rng.normal(size=(C, 3 * C)), jnp.bfloat16)
    x2 = x.reshape(B * L, C)
    fm = jax.jit(lambda a, w: a @ w)
    timeit("raw (33280,384)@(384,1152)", lambda: fm(x2, W))
    W1 = jnp.asarray(rng.normal(size=(C, 4 * C)), jnp.bfloat16)
    W2 = jnp.asarray(rng.normal(size=(4 * C, C)), jnp.bfloat16)
    fmlp = jax.jit(lambda a, w1, w2: jax.nn.gelu(a @ w1) @ w2)
    timeit("raw mlp 384->1536->384", lambda: fmlp(x2, W1, W2))


if __name__ == "__main__":
    main()
