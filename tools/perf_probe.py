"""On-chip microbenchmarks for the round-4 perf work.

Measures, on the real TPU (honest np.asarray-synced timing):
  1. fine-former correlation: full-map sublane-reduce (new default) vs
     the per-track DMA Pallas kernel vs the einsum dot-then-slice,
     at the matched fine-call shape (2048 tracks x 8 frames, 3 levels,
     6 iterations);
  2. coarse C=128 Pallas corr f32 vs the XLA gather path;
  3. jit_sfm: run_sfm as eager-composed jitted kernels vs ONE jitted
     program, matched problem size (VERDICT r3 #5).

Usage: python tools/perf_probe.py [--probe fine|coarse|sfm|all]
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
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np  # noqa: E402


def sync(x):
    """Honest timing on the tunneled backend: device->host transfer."""
    import jax

    return np.asarray(jax.tree.leaves(x)[0].block_until_ready())


def bench_call(fn, *args, reps=3):
    import jax

    out = fn(*args)  # compile
    sync(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        times.append(time.time() - t0)
    return float(np.median(times))


def probe_fine():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.tracker import build_corr_pyramid, corr_sample

    rng = np.random.default_rng(0)
    Bv, S, C = 2048, 8, 32  # matched fine chunk: 2048 tracks x 8 frames
    H = W = 31
    fmaps = jnp.asarray(rng.normal(size=(Bv, S, H, W, C)), jnp.bfloat16)
    feats = jnp.asarray(rng.normal(size=(Bv, S, 1, C)), jnp.bfloat16)
    coords0 = jnp.asarray(rng.uniform(4, 27, size=(Bv, S, 1, 2)),
                          jnp.float32)

    def six_iter(mode):
        @jax.jit
        def run(fm, co, tf):
            pyr = build_corr_pyramid(fm, 3)
            acc = 0.0
            c = co
            for i in range(6):
                corr = corr_sample(pyr, c, tf, 3,
                                   use_pallas=(mode == "pallas"))
                acc = acc + jnp.sum(corr)
                c = c + 0.1  # force per-iter recompute
            return acc
        return run

    out = {}
    for mode in ("fullmap", "pallas"):
        try:
            t = bench_call(six_iter(mode), fmaps, coords0, feats)
            out[f"fine_corr_6iter_{mode}_s"] = round(t, 4)
        except Exception as e:  # noqa: BLE001
            out[f"fine_corr_6iter_{mode}_s"] = f"ERROR {type(e).__name__}"
    return out


def probe_coarse():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.tracker import build_corr_pyramid, corr_sample

    rng = np.random.default_rng(0)
    S, N, C = 8, 4096, 128
    H = W = 128
    fmaps = jnp.asarray(rng.normal(size=(1, S, H, W, C)), jnp.bfloat16)
    feats = jnp.asarray(rng.normal(size=(1, S, N, C)), jnp.bfloat16)
    coords = jnp.asarray(rng.uniform(5, 120, size=(1, S, N, 2)),
                         jnp.float32)

    def six_iter(use_pallas):
        @jax.jit
        def run(fm, co, tf):
            pyr = build_corr_pyramid(fm, 5)
            acc = 0.0
            c = co
            for i in range(6):
                corr = corr_sample(pyr, c, tf, 4, use_pallas=use_pallas)
                acc = acc + jnp.sum(corr)
                c = c + 0.1
            return acc
        return run

    out = {}
    for mode, up in (("pallas", True), ("xla", False)):
        try:
            t = bench_call(six_iter(up), fmaps, coords, feats)
            out[f"coarse_corr_6iter_{mode}_s"] = round(t, 4)
        except Exception as e:  # noqa: BLE001
            out[f"coarse_corr_6iter_{mode}_s"] = f"ERROR {type(e).__name__}"
    return out


def probe_sfm():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from test_sfm import make_scene

    from vggsfm_tpu.sfm import SfmConfig, run_sfm

    rng = np.random.default_rng(3)
    # production-like: 8 frames, ~16k tracks (post comple_nonvis concat)
    extr, intr, X, tracks, vis = make_scene(rng, S=8, N=16384,
                                            noise_px=0.5,
                                            outlier_frac=0.1)
    extr_n = extr.copy()
    extr_n[1:, :, 3] += rng.normal(scale=0.05, size=(7, 3))
    cfg = SfmConfig(robust_refine=2, ba_iters=2)
    args = (jnp.asarray(extr_n, jnp.float32), jnp.asarray(intr, jnp.float32),
            jnp.asarray(tracks, jnp.float32), jnp.asarray(vis))

    out = {}
    t0 = time.time()
    eager = run_sfm(*args, (640, 480), cfg=cfg)
    sync(eager["extrinsics"])
    out["sfm_eager_first_s"] = round(time.time() - t0, 2)
    times = []
    for _ in range(2):
        t0 = time.time()
        sync(run_sfm(*args, (640, 480), cfg=cfg)["extrinsics"])
        times.append(time.time() - t0)
    out["sfm_eager_steady_s"] = round(float(np.median(times)), 3)

    jitted = jax.jit(partial(run_sfm, image_size=(640, 480), cfg=cfg))
    t0 = time.time()
    sync(jitted(*args)["extrinsics"])
    out["sfm_jit_compile_s"] = round(time.time() - t0, 2)
    times = []
    for _ in range(2):
        t0 = time.time()
        sync(jitted(*args)["extrinsics"])
        times.append(time.time() - t0)
    out["sfm_jit_steady_s"] = round(float(np.median(times)), 3)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--probe", default="all",
                   choices=["fine", "coarse", "sfm", "all"])
    args = p.parse_args()
    import jax

    results = {"device": str(jax.devices()[0])}
    if args.probe in ("fine", "all"):
        results.update(probe_fine())
        print(json.dumps(results), flush=True)
    if args.probe in ("coarse", "all"):
        results.update(probe_coarse())
        print(json.dumps(results), flush=True)
    if args.probe in ("sfm", "all"):
        results.update(probe_sfm())
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
