"""Round-4 stage-internal microbenchmarks (real TPU).

Splits the bench's hot stages into parts to find where non-MXU time goes:
  fmaps   — BasicEncoder forward at the matched (8, 512, 512, 3) shape
            (bench showed 3.2 s at 0.1% MFU for 608 GFLOP — pathological)
  former  — coarse EfficientUpdateFormer alone, B=1 vs B=8 batched
  fine    — extract_patches / fine fnet / fine former / fine corr parts
  coarseB — full coarse predictor call at B=1 (x8) vs one B=8 call

Usage: python tools/perf_probe2.py [--probe fmaps|former|fine|coarseB|all]
NEVER run while another TPU client is active (axon tunnel wedges).
"""

from __future__ import annotations

import argparse
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


def probe_fmaps():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.encoders import BasicEncoder

    rng = np.random.default_rng(0)
    out = {}
    enc = BasicEncoder(output_dim=128, stride=4, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(size=(8, 512, 512, 3)), jnp.float32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), x[:1])
    f = jax.jit(lambda p, xx: enc.apply(p, xx))
    out["fmaps_basic_encoder_s"] = round(bench_call(f, params, x), 4)

    # conv1 alone (7x7 s2, C=3 input — the classic bad-layout conv)
    import flax.linen as nn

    class C1(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                           dtype=jnp.bfloat16)(x)

    c1 = C1()
    p1 = jax.jit(c1.init)(jax.random.PRNGKey(0), x[:1])
    out["fmaps_conv1_only_s"] = round(
        bench_call(jax.jit(lambda p, xx: c1.apply(p, xx)), p1, x), 4)
    return out


def probe_former():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.tracker import EfficientUpdateFormer

    rng = np.random.default_rng(0)
    out = {}
    m = EfficientUpdateFormer(hidden_size=384, output_dim=130,
                              dtype=jnp.bfloat16)
    for B in (1, 8):
        x = jnp.asarray(rng.normal(size=(B, 4096, 8, 456)), jnp.bfloat16)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x[:1, :128])
        f = jax.jit(lambda p, xx: m.apply(p, xx))
        t = bench_call(f, params, x)
        out[f"coarse_former_B{B}_s"] = round(t, 4)
    # 6 chained applies at B=1 ~ the per-iter former cost inside coarse
    return out


def probe_fine():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.encoders import ShallowEncoder
    from vggsfm_tpu.models.refine import extract_patches
    from vggsfm_tpu.models.tracker import (
        BaseTrackerPredictor,
        build_corr_pyramid,
        corr_sample,
    )

    rng = np.random.default_rng(0)
    out = {}
    N = 2048
    S = 8

    # 1. patch extraction from the full-res frames
    imgs = jnp.asarray(rng.uniform(size=(1, S, 1024, 1024, 3)),
                       jnp.bfloat16)
    centers = jnp.asarray(rng.uniform(50, 950, size=(1, S, N, 2)),
                          jnp.float32)
    f = jax.jit(lambda im, c: extract_patches(im, c, 15)[0])
    out["fine_extract_patches_s"] = round(bench_call(f, imgs, centers), 4)

    # 2. fine fnet on the patches
    enc = ShallowEncoder(output_dim=32, stride=1, dtype=jnp.bfloat16)
    patches = jnp.asarray(rng.uniform(size=(S * N, 31, 31, 3)),
                          jnp.bfloat16)
    pp = jax.jit(enc.init)(jax.random.PRNGKey(0), patches[:8])
    f = jax.jit(lambda p, xx: enc.apply(p, xx))
    out["fine_fnet_s"] = round(bench_call(f, pp, patches), 4)

    # 3. the fine former (time-only, depth 4, hidden 256) — 6 iters worth
    m = BaseTrackerPredictor(stride=1, depth=4, corr_levels=3,
                             corr_radius=3, latent_dim=32, hidden_size=256,
                             fine=True, use_spaceatt=False,
                             dtype=jnp.bfloat16)
    fmaps = jnp.asarray(rng.normal(size=(N, S, 31, 31, 32)), jnp.bfloat16)
    qp = jnp.asarray(rng.uniform(5, 25, size=(N, 1, 2)), jnp.float32)
    params = jax.jit(m.init, static_argnames=("iters",))(
        jax.random.PRNGKey(0), qp[:8], fmaps[:8], iters=1)
    f = jax.jit(lambda p, q, fm: m.apply(p, q, fm, iters=6)[0][-1])
    out["fine_predictor_6iter_s"] = round(bench_call(f, params, qp, fmaps),
                                          4)

    # 4. fine corr with PER-ITER VARYING track feats (probe_fine in
    # perf_probe.py held them constant -> XLA CSE'd the full-map compute)
    feats0 = jnp.asarray(rng.normal(size=(N, S, 1, 32)), jnp.bfloat16)
    coords0 = jnp.asarray(rng.uniform(4, 27, size=(N, S, 1, 2)),
                          jnp.float32)

    @jax.jit
    def run(fm, co, tf):
        pyr = build_corr_pyramid(fm, 3)
        acc = 0.0
        c, t = co, tf
        for i in range(6):
            corr = corr_sample(pyr, c, t, 3, use_pallas=False)
            acc = acc + jnp.sum(corr)
            c = c + 0.1
            t = t + 0.01  # varying feats: no CSE across iters
        return acc

    out["fine_corr_6iter_varfeat_s"] = round(
        bench_call(run, fmaps, coords0, feats0), 4)
    return out


def probe_coarseB():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.tracker import BaseTrackerPredictor

    rng = np.random.default_rng(0)
    out = {}
    m = BaseTrackerPredictor(stride=4, dtype=jnp.bfloat16,
                             use_pallas_corr=True)
    N, S, H, W, C = 4096, 8, 128, 128, 128
    qp1 = jnp.asarray(rng.uniform(5, 120, size=(1, N, 2)), jnp.float32)
    fm1 = jnp.asarray(rng.normal(size=(1, S, H, W, C)), jnp.bfloat16)
    params = jax.jit(m.init, static_argnames=("iters", "down_ratio"))(
        jax.random.PRNGKey(0), qp1[:, :64], fm1, iters=1, down_ratio=2)

    f1 = jax.jit(lambda p, q, fm: m.apply(p, q, fm, iters=6, down_ratio=2,
                                          matching_init=True)[0][-1])
    try:
        out["coarse_full_B1_s"] = round(bench_call(f1, params, qp1, fm1), 4)
    except Exception as e:  # noqa: BLE001
        out["coarse_full_B1_s"] = f"ERROR {type(e).__name__}"

    Q = 8
    qpQ = jnp.asarray(rng.uniform(5, 120, size=(Q, N, 2)), jnp.float32)
    fmQ = jnp.asarray(rng.normal(size=(Q, S, H, W, C)), jnp.bfloat16)
    fQ = jax.jit(lambda p, q, fm: m.apply(p, q, fm, iters=6, down_ratio=2,
                                          matching_init=True)[0][-1])
    try:
        out["coarse_full_B8_s"] = round(bench_call(fQ, params, qpQ, fmQ), 4)
    except Exception as e:  # noqa: BLE001
        out["coarse_full_B8_s"] = f"ERROR {type(e).__name__}"
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probe", default="all",
                   choices=["fmaps", "former", "fine", "coarseB", "all"])
    args = p.parse_args()
    import jax

    results = {"device": str(jax.devices()[0])}
    for name, fn in (("fmaps", probe_fmaps), ("former", probe_former),
                     ("fine", probe_fine), ("coarseB", probe_coarseB)):
        if args.probe in (name, "all"):
            results.update(fn())
            print(json.dumps(results), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
