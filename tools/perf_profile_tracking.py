"""Capture a JAX profiler trace of one coarse + one fine call (real TPU)
and print the top HLO ops by self time.

The MFU ledger says WHERE stage time goes (coarse 2.5 s / fine 3.5 s at
the bench) but not WHICH ops burn it — this probe answers that via the
xplane trace + tensorboard_plugin_profile's converters.

Usage: python tools/perf_profile_tracking.py [--what coarse,fine]
NEVER run while another TPU client is active.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402


def top_ops_from_xspace(logdir, n=40):
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.xplane.pb")))
    if not paths:
        print("no xplane found under", logdir)
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_op_stats", "op_stats", "hlo_stats",
                 "framework_op_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [paths[-1]], tool, {})
        except Exception as e:  # noqa: BLE001
            print(f"tool {tool}: {type(e).__name__}: {e}")
            continue
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except Exception:  # noqa: BLE001
                pass
            data = data.decode("utf-8", "replace")
        print(f"===== {tool} (first 8000 chars) =====")
        print(data[:8000])
        return
    print("no tool produced data")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="fine")
    ap.add_argument("--out", default="/tmp/jax_trace_tracking")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.models.refine import refine_track
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

    rng = np.random.default_rng(0)
    r = VGGSfMRunner(RunnerConfig(img_size=1024))
    params = r.params["tracker"]
    imgs = jnp.asarray(rng.uniform(size=(1, 8, 1024, 1024, 3)),
                       jnp.float32)

    def sync(x):
        leaves = [v for v in jax.tree.leaves(x) if hasattr(v, "shape")]
        return np.asarray(leaves[0].ravel()[0])

    todo = args.what.split(",")
    fns = {}
    if "fine" in todo:
        tr = jnp.asarray(rng.uniform(50, 950, size=(1, 8, 2048, 2)),
                         jnp.float32)

        def fine_fn(p, im, t):
            def fnet(x):
                return r.tracker.apply(p, x, True,
                                       method="apply_fine_fnet")

            def ftrack(q, f, iters, return_feat, matching_init,
                       fmaps_flat_hw=None):
                return r.tracker.apply(p, q, f, iters, return_feat,
                                       matching_init, fmaps_flat_hw,
                                       method="apply_fine_predictor")

            return refine_track(im, fnet, ftrack, t, compute_score=True,
                                matching_init=True, subpixel_refine=True,
                                patch_dtype=jnp.bfloat16, flat_fnet=True)

        fns["fine"] = (jax.jit(fine_fn), (params, imgs, tr))
    if "coarse" in todo:
        fmaps = r._fmaps(imgs)
        qp = jnp.asarray(rng.uniform(50, 950, size=(1, 4096, 2)),
                         jnp.float32)

        def coarse_fn(p, f, q):
            preds, vis = r.tracker.apply(
                p, q, f, 6, 2,
                method=lambda m, qq, ff, iters, dr: m.coarse_predictor(
                    qq, ff, iters=iters, down_ratio=dr,
                    matching_init=True, matching_vis=True))
            return preds[-1], vis

        fns["coarse"] = (jax.jit(coarse_fn), (params, fmaps, qp))

    # warm everything first
    for name, (fn, a) in fns.items():
        sync(fn(*a))
        print(f"{name} warmed", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for name, (fn, a) in fns.items():
            sync(fn(*a))
    print("trace captured", flush=True)
    top_ops_from_xspace(args.out)


if __name__ == "__main__":
    main()
