"""Stage-level bisect of run_sfm's on-chip time (real TPU).

BENCH r05: run_sfm = 2.63 s device at 8 frames x 24k tracks. This probe
times each internal stage as its own jitted program at matched shapes so
the 2.6 s can be attributed: pair triangulation, init BA, pose refinement,
LORANSAC track triangulation (256/128 trials), global BA (by LM iteration
count), filtering. Stage wall times include one ~0.4 s tunnel dispatch
RTT each (measured separately as `rtt_floor`); the run_sfm total pays it
once — stage numbers are for RELATIVE attribution.

Usage: python tools/perf_probe_sfm2.py   (never concurrent with other TPU jobs)
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from test_sfm import make_scene

    import vggsfm_tpu.sfm.triangulator as tri
    from vggsfm_tpu.ba import BAConfig, bundle_adjust
    from vggsfm_tpu.geometry.cameras import cam_from_img
    from vggsfm_tpu.ops.triangulation import (
        filter_points3d, triangulate_by_pair, triangulate_tracks,
    )
    from vggsfm_tpu.sfm import SfmConfig, run_sfm
    from vggsfm_tpu.sfm.refine import refine_poses

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

    rng = np.random.default_rng(3)
    S, N = 8, 24576
    extr, intr, X, tracks, vis = make_scene(rng, S=S, N=N,
                                            noise_px=0.5, outlier_frac=0.1)
    extr_n = extr.copy()
    extr_n[1:, :, 3] += rng.normal(scale=0.05, size=(S - 1, 3))
    extr_j = jnp.asarray(extr_n, jnp.float32)
    intr_j = jnp.asarray(intr, jnp.float32)
    tracks_j = jnp.asarray(tracks, jnp.float32)
    vis_j = jnp.asarray(vis)

    # RTT floor: a trivial program, timed the same way
    tiny = jax.jit(lambda x: x + 1.0)
    timeit("rtt_floor (x+1)", lambda: tiny(jnp.zeros((8,))))

    cfg = SfmConfig(robust_refine=2, ba_iters=1, ba_max_iterations=25,
                    max_ransac_iters=256)

    jitted = jax.jit(partial(run_sfm, image_size=(640, 480), cfg=cfg))
    timeit("run_sfm FULL (robust2, ba1)",
           lambda: jitted(extr_j, intr_j, tracks_j, vis_j)["extrinsics"])

    tn = jax.jit(cam_from_img)(tracks_j, intr_j, None)

    j_pair = jax.jit(triangulate_by_pair)
    timeit("triangulate_by_pair", lambda: j_pair(extr_j, tn)[0])

    j_tri256 = jax.jit(partial(triangulate_tracks, max_ransac_iters=256,
                               seed=1))
    timeit("triangulate_tracks 256 trials",
           lambda: j_tri256(extr_j, tn, track_vis=vis_j,
                            track_score=None)[0])
    j_tri128 = jax.jit(partial(triangulate_tracks, max_ransac_iters=128,
                               seed=1))
    timeit("triangulate_tracks 128 trials",
           lambda: j_tri128(extr_j, tn, track_vis=vis_j,
                            track_score=None)[0])
    j_tri64 = jax.jit(partial(triangulate_tracks, max_ransac_iters=64,
                              seed=1))
    timeit("triangulate_tracks 64 trials",
           lambda: j_tri64(extr_j, tn, track_vis=vis_j,
                           track_score=None)[0])

    Xj = jnp.asarray(X, jnp.float32)
    mask = jnp.asarray(vis > 0.05)

    for it in (1, 5, 25):
        ba_cfg = BAConfig(max_iterations=it)
        jba = jax.jit(partial(bundle_adjust, cfg=ba_cfg))
        timeit(f"bundle_adjust max_iterations={it}",
               lambda jba=jba: jba(extr_j, intr_j, Xj, tracks_j,
                                   mask)[0])

    obs = mask
    j_ref = jax.jit(partial(refine_poses, image_size=(640, 480),
                            force_estimate=True,
                            shared_intrinsics=False,
                            refine_intrinsics=True))
    timeit("refine_poses (force_estimate)",
           lambda: j_ref(extr_j, intr_j, Xj, tracks_j, obs,
                         pnp_key=jax.random.PRNGKey(9))[0])

    j_filt = jax.jit(partial(filter_points3d, max_reproj_error=4.0,
                             check_triangle=False))
    timeit("filter_points3d",
           lambda: j_filt(Xj, tracks_j, extr_j, intr_j, None,
                          obs_mask=mask)[0])


if __name__ == "__main__":
    main()
