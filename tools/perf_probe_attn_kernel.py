"""Feasibility probe: per-head attention inside a Pallas kernel (real TPU).

Round-5 verified (this exact kernel, on-chip): Mosaic COMPILES AND RUNS
48-wide lane slices (q[:, h*48:(h+1)*48]) and per-head batched
dot_generals with L=8 sequences folded into sublanes — max diff vs the
XLA reference 0.008 (bf16 noise). The full fused transformer block
(LN + QKV + attention + out-proj + residual + the existing fused MLP)
is therefore implementable for the update former's time blocks; the
round-5 "blocked on unaligned head dim" concern was wrong. Next step
(round 6): extend ops/fused_mlp.py into a full block kernel and A/B
against the ~2.8 ms/block XLA path (tools/perf_probe_former.py).

Usage: python tools/perf_probe_attn_kernel.py
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    TB, L, H, D = 256, 8, 8, 48
    C = H * D

    def kernel(q_ref, k_ref, o_ref):
        q = q_ref[:]
        k = k_ref[:]
        out = []
        for h in range(H):
            qh = q[:, h * D:(h + 1) * D].reshape(TB, L, D)
            kh = k[:, h * D:(h + 1) * D].reshape(TB, L, D)
            s = jax.lax.dot_general(
                qh, kh, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s / (D ** 0.5), axis=-1).astype(q.dtype)
            oh = jax.lax.dot_general(
                p, kh, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out.append(oh.reshape(TB * L, D))
        o_ref[:] = jnp.concatenate(out, axis=1).astype(q.dtype)

    @jax.jit
    def run(q, k):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TB * L, C), q.dtype),
            in_specs=[pl.BlockSpec((TB * L, C), lambda: (0, 0))] * 2,
            out_specs=pl.BlockSpec((TB * L, C), lambda: (0, 0)),
        )(q, k)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(TB * L, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(TB * L, C)), jnp.bfloat16)
    out = run(q, k)
    np.asarray(out[:1, :1])

    def ref(q, k):
        qh = q.astype(jnp.float32).reshape(TB, L, H, D).transpose(0, 2, 1, 3)
        kh = k.astype(jnp.float32).reshape(TB, L, H, D).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhld,bhmd->bhlm", qh, kh)
        p = jax.nn.softmax(s / (D ** 0.5), -1)
        o = jnp.einsum("bhlm,bhmd->bhld", p, kh)
        return o.transpose(0, 2, 1, 3).reshape(TB * L, C)

    d = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref(q, k))))
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(run(q, k)[:1, :1])
        ts.append(time.time() - t0)
    print(f"max diff vs XLA reference: {d:.4f} (bf16 noise)")
    print(f"kernel wall incl RTT: {min(ts)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
