"""Bisect run_sfm's on-chip steady time over its config axes (real TPU).

The whole-solve jit (jit_sfm) showed ~5 s device time at the bench's
32k-track workload with near-zero FLOPs — sequential latency inside one
XLA program. Varies one axis at a time at the matched problem size:
ba_iters, robust_refine, ba_max_iterations, max_ransac_iters.

Usage: python tools/perf_probe_sfm.py
NEVER run while another TPU client is active.
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


def sync(x):
    import jax

    leaves = [v for v in jax.tree.leaves(x) if hasattr(v, "shape")]
    return np.asarray(leaves[0].ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    from test_sfm import make_scene

    from vggsfm_tpu.sfm import SfmConfig, run_sfm

    rng = np.random.default_rng(3)
    extr, intr, X, tracks, vis = make_scene(rng, S=8, N=24576,
                                            noise_px=0.5, outlier_frac=0.1)
    extr_n = extr.copy()
    extr_n[1:, :, 3] += rng.normal(scale=0.05, size=(7, 3))
    args = (jnp.asarray(extr_n, jnp.float32),
            jnp.asarray(intr, jnp.float32),
            jnp.asarray(tracks, jnp.float32), jnp.asarray(vis))

    base = dict(robust_refine=2, ba_iters=1, ba_max_iterations=25,
                max_ransac_iters=256)
    variants = {
        "base": {},
        "ba_iters0": {"ba_iters": 0},
        "ba_iters2": {"ba_iters": 2},
        "robust0": {"robust_refine": 0},
        "lm5": {"ba_max_iterations": 5},
        "ransac64": {"max_ransac_iters": 64},
    }
    out = {"device": str(jax.devices()[0]), "tracks": 24576}
    for name, ov in variants.items():
        cfg = SfmConfig(**{**base, **ov})
        jitted = jax.jit(partial(run_sfm, image_size=(640, 480), cfg=cfg))
        t0 = time.time()
        sync(jitted(*args)["extrinsics"])
        compile_s = time.time() - t0
        times = []
        for _ in range(2):
            t0 = time.time()
            sync(jitted(*args)["extrinsics"])
            times.append(time.time() - t0)
        out[name] = {"steady_s": round(float(np.median(times)), 3),
                     "compile_s": round(compile_s, 1)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
