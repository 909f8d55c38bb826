"""Layout probes: the C=3 minor-dim padding question (real TPU).

A trailing dim of 3 pads to 128 lanes in the default TPU layout — if XLA
materializes NHWC image tensors that way, every elementwise/resize op on
images pays ~42x physical traffic. Measures:
  resize   — 1024->512 bilinear-matmul resize, NHWC vs channels-first
  extract  — 31x31 patch extraction, NHWC dynamic_slice vs merged (W*C)
  fnet     — ShallowEncoder on (16384, 31, 31, 3)

Usage: python tools/perf_probe3.py
NEVER run while another TPU client is active.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def sync(x):
    import jax

    leaves = [v for v in jax.tree.leaves(x) if hasattr(v, "shape")]
    return np.asarray(leaves[0].ravel()[0])


def bench_call(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        times.append(time.time() - t0)
    return float(np.median(times))


def main():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.sampling import interpolate_bilinear

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}

    x = jnp.asarray(rng.uniform(size=(8, 1024, 1024, 3)), jnp.float32)

    f_nhwc = jax.jit(lambda v: interpolate_bilinear(v, (512, 512)))
    out["resize_nhwc_s"] = round(bench_call(f_nhwc, x), 4)

    @jax.jit
    def f_nchw(v):
        t = v.transpose(0, 3, 1, 2)  # (B, 3, H, W)
        from vggsfm_tpu.models.sampling import _interp_matrix

        My = _interp_matrix(1024, 512, True, v.dtype)
        t = jnp.einsum("oh,bchw->bcow", My, t)
        t = jnp.einsum("pw,bcow->bcop", My, t)
        return t.transpose(0, 2, 3, 1)

    out["resize_nchw_s"] = round(bench_call(f_nchw, x), 4)

    @jax.jit
    def f_merged(v):
        B, H, W, C = v.shape
        from vggsfm_tpu.models.sampling import _interp_matrix

        My = _interp_matrix(1024, 512, True, v.dtype)
        t = v.reshape(B, H, W * C)
        t = jnp.einsum("oh,bhk->bok", My, t)  # h-resize, (B, 512, W*C)
        t = t.reshape(B, 512, W, C).transpose(0, 1, 3, 2)  # (B,512,C,W)
        t = jnp.einsum("pw,bocw->bocp", My, t)
        return t.transpose(0, 1, 3, 2)  # (B, 512, 512, C)

    out["resize_merged_s"] = round(bench_call(f_merged, x), 4)
    print(json.dumps(out), flush=True)

    # patch extraction: current NHWC dynamic_slice vs merged-minor slices
    from vggsfm_tpu.models.refine import extract_patches

    imgs = x[None].astype(jnp.bfloat16)  # (1, 8, 1024, 1024, 3)
    centers = jnp.asarray(rng.uniform(50, 950, size=(1, 8, 2048, 2)),
                          jnp.float32)
    f = jax.jit(lambda im, c: extract_patches(im, c, 15)[0])
    out["extract_nhwc_s"] = round(bench_call(f, imgs, centers), 4)

    @jax.jit
    def f_ex_merged(im, c):
        B, S, H, W, C = im.shape
        N = c.shape[2]
        psize = 31
        track_int = jnp.floor(c).astype(jnp.int32)
        tl = track_int - 15
        tx = jnp.clip(tl[..., 0], 0, W - psize)
        ty = jnp.clip(tl[..., 1], 0, H - psize)
        merged = im.reshape(B * S, H, W * C)
        yx = jnp.stack([ty, tx * C], -1).reshape(B * S, N, 2)

        def one(img, p):
            return jax.lax.dynamic_slice(img, (p[0], p[1]),
                                         (psize, psize * C))

        pat = jax.vmap(jax.vmap(one, in_axes=(None, 0)))(merged, yx)
        return pat.reshape(B, S, N, psize, psize, C)

    out["extract_merged_s"] = round(bench_call(f_ex_merged, imgs, centers),
                                    4)
    print(json.dumps(out), flush=True)

    # upload cost: NHWC f32 vs uint8
    h = np.asarray(rng.uniform(size=(8, 1024, 1024, 3)), np.float32)
    t0 = time.time()
    sync(jnp.asarray(h) + 0)
    out["upload_f32_nhwc_s"] = round(time.time() - t0, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
