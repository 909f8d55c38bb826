"""Bisect the preliminary stage's on-chip time (real TPU).

BENCH_r04: `preliminary` = 4.456 s device time for 10 GFLOP (MFU ~ 0) —
latency-bound, not flops-bound. This probe times the stage and its pieces
at the matched-workload shapes (7 pairs x ~32k tracks, 1024 RANSAC iters)
so the serialization can be attributed: 7pt minimal solves (Jacobi eigh),
streaming score maps, local-refine 8pt DLT chains, E/R/t decomposition.

Usage: python tools/perf_probe_prelim.py [--n-tracks 32768] [--reps 3]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])


def timeit(label, fn, reps=3):
    fn()  # compile
    sync_out = fn()
    sync(sync_out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        sync(out)
        ts.append(time.time() - t0)
    print(f"{label:48s} {min(ts)*1e3:9.1f} ms (min of {reps})", flush=True)
    return min(ts)


def make_pairs(P, N, seed=0, inlier_frac=0.6, noise=1.0):
    rng = np.random.default_rng(seed)
    W = H = 1024
    pts1 = rng.uniform(0, W, size=(P, N, 2)).astype(np.float32)
    # planted rigid geometry: project random 3D points into two views
    pts3d = rng.uniform(-1, 1, size=(P, N, 3)).astype(np.float32)
    pts3d[..., 2] += 4.0
    f = 1000.0
    x1 = pts3d[..., :2] / pts3d[..., 2:] * f + W / 2
    ang = 0.15
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]], dtype=np.float32)
    t = np.array([0.5, 0.02, 0.0], dtype=np.float32)
    p2 = pts3d @ R.T + t
    x2 = p2[..., :2] / p2[..., 2:] * f + W / 2
    inl = rng.uniform(size=(P, N)) < inlier_frac
    pts1 = np.where(inl[..., None], x1 + rng.normal(0, noise, x1.shape), pts1)
    pts2 = np.where(inl[..., None],
                    x2 + rng.normal(0, noise, x2.shape),
                    rng.uniform(0, W, size=(P, N, 2))).astype(np.float32)
    return jnp.asarray(pts1.astype(np.float32)), jnp.asarray(pts2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-tracks", type=int, default=32768)
    ap.add_argument("--pairs", type=int, default=7)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    P, N = args.pairs, args.n_tracks
    p1, p2 = make_pairs(P, N)
    key = jax.random.PRNGKey(0)

    from functools import partial

    from vggsfm_tpu.twoview.fundamental import (
        _stream_local_refine, _stream_scores, estimate_fundamental,
        run_7point, run_8point,
    )
    from vggsfm_tpu.twoview.preliminary import estimate_preliminary_cameras
    from vggsfm_tpu.twoview.utils import generate_samples

    # ---- full preliminary at runner shapes
    tr = jnp.concatenate(
        [p1[0][None], p2], axis=0)[None]  # (1, P+1, N, 2)
    vis = jnp.ones((1, P + 1, N), jnp.float32)
    timeit("estimate_preliminary_cameras (full)",
           lambda: estimate_preliminary_cameras(
               tr, vis, 1024, 1024, key, max_error=4.0,
               max_ransac_iters=1024, lo_num=128)["extrinsics"],
           args.reps)

    # ---- estimate_fundamental full + variants
    def ef(**kw):
        kwargs = dict(max_ransac_iters=1024, max_error=4.0, lo_num=128)
        kwargs.update(kw)
        return estimate_fundamental(p1, p2, key, **kwargs)["fmat"]

    timeit("estimate_fundamental (default c128)", lambda: ef(), args.reps)
    timeit("estimate_fundamental chunk=512", lambda: ef(chunk=512),
           args.reps)
    timeit("estimate_fundamental chunk=1024", lambda: ef(chunk=1024),
           args.reps)
    timeit("estimate_fundamental chunk=3072", lambda: ef(chunk=3072),
           args.reps)
    timeit("estimate_fundamental no 2nd refine",
           lambda: ef(second_refine=False), args.reps)
    timeit("estimate_fundamental c1024 no2nd",
           lambda: ef(chunk=1024, second_refine=False), args.reps)
    timeit("estimate_fundamental lo_num=32 c1024",
           lambda: ef(lo_num=32, chunk=1024), args.reps)

    # ---- pieces
    sample_idx, _ = generate_samples(key, N, 1024, 7)
    left = jnp.take(p1, sample_idx, axis=1).reshape(-1, 7, 2)
    right = jnp.take(p2, sample_idx, axis=1).reshape(-1, 7, 2)
    j7 = jax.jit(run_7point)
    timeit(f"run_7point ({left.shape[0]} minimal sets)",
           lambda: j7(left, right)[0], args.reps)

    F7 = j7(left, right)[0].reshape(P, 1024 * 3, 3, 3)
    valid = jnp.ones(F7.shape[:2], bool)
    pv = jnp.ones((P, N), bool)

    for chunk in (128, 1024, 3072):
        js = jax.jit(partial(_stream_scores, thres=16.0, chunk=chunk,
                             squared=True))
        timeit(f"_stream_scores 3072 cands chunk={chunk}",
               lambda js=js: js(p1, p2, F7, valid, pv)[0], args.reps)

    Fsel = F7[:, :128]
    for chunk in (32, 128):
        jr = jax.jit(partial(_stream_local_refine, thres=16.0, chunk=chunk,
                             squared=True))
        timeit(f"_stream_local_refine 128 cands chunk={chunk}",
               lambda jr=jr: jr(p1, p2, Fsel, pv), args.reps)

    # 8pt DLT at refine shapes: (P, chunk, N) masked
    inl = jnp.ones((P, 32, N), jnp.float32)
    p1b = jnp.broadcast_to(p1[:, None], (P, 32, N, 2))
    p2b = jnp.broadcast_to(p2[:, None], (P, 32, N, 2))
    j8 = jax.jit(run_8point)
    timeit("run_8point (7x32 masked, N=%d)" % N,
           lambda: j8(p1b, p2b, inl), args.reps)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    globals()["jax"] = jax
    globals()["jnp"] = jnp
    print("device:", jax.devices()[0], flush=True)
    main()
