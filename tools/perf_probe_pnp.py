"""Bisect refine_poses' 838 ms on-chip (real TPU).

perf_probe_sfm2: refine_poses(force_estimate) = 838 ms of run_sfm's
2400 ms, called 3x (2x with PnP). This probe times the pieces: the
pose-only LM BA, the two absolute_pose_ransac calls (f_trials=1 / 17),
and solve_pnp_dlt's stages at the production shapes.

Usage: python tools/perf_probe_pnp.py   (never concurrent with other TPU jobs)
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.ba import BAConfig, bundle_adjust
    from vggsfm_tpu.ops.eigh import smallest_eigenvector
    from vggsfm_tpu.twoview.pnp import absolute_pose_ransac, solve_pnp_dlt

    def sync(x):
        leaves = [v for v in jax.tree.leaves(x) if hasattr(v, "shape")]
        return np.asarray(leaves[0].ravel()[0])

    def timeit(label, fn, reps=2):
        fn()
        sync(fn())
        ts = []
        for _ in range(reps):
            t0 = time.time()
            sync(fn())
            ts.append(time.time() - t0)
        print(f"{label:44s} {min(ts)*1e3:9.1f} ms", flush=True)
        return min(ts)

    rng = np.random.default_rng(0)
    S, P, N = 8, 8192, 24576
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(P, 3)).astype(np.float32)
    p3 = jnp.asarray(np.broadcast_to(X[None], (S, P, 3)))
    f = 600.0
    uv = X[:, :2] / X[:, 2:] * f + 320.0
    p2 = jnp.asarray(np.broadcast_to(uv[None], (S, P, 2))
                     + rng.normal(scale=1.0, size=(S, P, 2))).astype(
                         jnp.float32)
    intr = jnp.broadcast_to(
        jnp.asarray([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1]],
                    jnp.float32), (S, 3, 3))
    vm = jnp.ones((S, P), bool)
    key = jax.random.PRNGKey(0)

    timeit("rtt_floor (x+1)", lambda: jax.jit(lambda x: x + 1)(
        jnp.zeros((8,))))

    jp1 = jax.jit(partial(absolute_pose_ransac, f_trials=1))
    timeit("absolute_pose_ransac f_trials=1",
           lambda: jp1(p3, p2, intr, key, valid_mask=vm)["extrinsics"])
    jp17 = jax.jit(partial(absolute_pose_ransac, f_trials=17))
    timeit("absolute_pose_ransac f_trials=17",
           lambda: jp17(p3, p2, intr, key, valid_mask=vm)["extrinsics"])

    # pose-only refine BA at run_sfm shapes (frozen points, huber)
    Xn = jnp.asarray(rng.uniform([-2, -2, 6], [2, 2, 10],
                                 size=(N, 3)).astype(np.float32))
    tracks = jnp.asarray(rng.uniform(0, 640, size=(S, N, 2)).astype(
        np.float32))
    mask = jnp.ones((S, N), bool)
    extr0 = jnp.broadcast_to(jnp.eye(3, 4, dtype=jnp.float32), (S, 3, 4))
    cfg = BAConfig(max_iterations=20, robust_loss="huber", loss_scale=3.0)
    jba = jax.jit(partial(bundle_adjust, cfg=cfg))
    timeit("refine BA (20it huber, frozen pts)",
           lambda: jba(extr0, intr.astype(jnp.float32), Xn, tracks, mask,
                       pose_free=jnp.ones((S,), bool),
                       intr_free=jnp.ones((S,), bool),
                       point_free=jnp.zeros((N,), bool))[0])

    # PnP internals at the two regimes
    R = 256
    from vggsfm_tpu.twoview.utils import generate_samples
    sample_idx, _ = generate_samples(key, P, R, 6)
    for BF in (8, 136):
        p3f = jnp.broadcast_to(p3[0][None], (BF, P, 3))
        p2f = jnp.broadcast_to(p2[0][None] / f, (BF, P, 2))
        p3s = jnp.take(p3f, sample_idx, axis=1)
        p2s = jnp.take(p2f, sample_idx, axis=1)
        jd = jax.jit(solve_pnp_dlt)
        timeit(f"solve_pnp_dlt minimal BF={BF} R={R}",
               lambda: jd(p3s, p2s))
        lo = 32
        p3l = jnp.broadcast_to(p3f[:, None], (BF, lo, P, 3))
        p2l = jnp.broadcast_to(p2f[:, None], (BF, lo, P, 2))
        w = jnp.ones((BF, lo, P), jnp.float32)
        jl = jax.jit(partial(solve_pnp_dlt, point_chunk=2048))
        timeit(f"solve_pnp_dlt lo-refine BF={BF} lo=32",
               lambda: jl(p3l, p2l, w))

    A12 = jnp.asarray(rng.normal(size=(136, 256, 12, 12)).astype(
        np.float32))
    A12 = A12 + jnp.swapaxes(A12, -1, -2)
    je = jax.jit(partial(smallest_eigenvector, num_sweeps=10))
    timeit("eigh 12x12 batch (136,256) sw10", lambda: je(A12))


if __name__ == "__main__":
    main()
