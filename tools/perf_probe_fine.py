"""Fine-stage end-to-end probe: the runner's exact _fine_track path.

Measures the full fine call (extract + fnet + 6-iter fine former + NCC
polish + score) at the production chunk shape, and ablations:
no-NCC-subpixel, no-score, and a 4096-track chunk.

Usage: python tools/perf_probe_fine.py
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

    from vggsfm_tpu.models.refine import refine_track
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}
    r = VGGSfMRunner(RunnerConfig(img_size=1024))
    params = r.params["tracker"]
    imgs = jnp.asarray(rng.uniform(size=(1, 8, 1024, 1024, 3)),
                       jnp.float32)

    def make(n, subpix, score):
        def fn(p, im, tr):
            def fnet(x):
                return r.tracker.apply(p, x, True,
                                       method="apply_fine_fnet")

            def ftrack(q, f, iters, return_feat, matching_init,
                       fmaps_flat_hw=None):
                return r.tracker.apply(p, q, f, iters, return_feat,
                                       matching_init, fmaps_flat_hw,
                                       method="apply_fine_predictor")

            return refine_track(im, fnet, ftrack, tr, compute_score=score,
                                matching_init=True, subpixel_refine=subpix,
                                patch_dtype=jnp.bfloat16, flat_fnet=True)
        return jax.jit(fn)

    for name, n, subpix, score in (
            ("fine2048_full", 2048, True, True),
            ("fine2048_nosubpix", 2048, False, True),
            ("fine2048_noscore", 2048, True, False),
            ("fine4096_full", 4096, True, True)):
        tr = jnp.asarray(rng.uniform(50, 950, size=(1, 8, n, 2)),
                         jnp.float32)
        try:
            t = bench_call(make(n, subpix, score), params, imgs, tr)
            out[name] = round(t, 4)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERROR {type(e).__name__}"
        print(json.dumps(out), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
