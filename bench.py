"""End-to-end benchmark: 8-frame sparse reconstruction on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference quotes ~20 s end-to-end for an 8-frame sparse-view
scene on one GPU at `query_frame_num=8 max_query_pts=4096 query_method=
aliked` (README.md:243-246) => 0.4 frames/s. The HEADLINE number is
measured at that same workload (8 query frames x 4096 points, fine
tracking, comple_nonvis on); a lighter 1-query config is also reported in
`detail` for round-over-round comparability.

The scene is a synthetic two-plane parallax render with *planted* cameras
(vggsfm_tpu/utils/synth.py), so the bench is also a correctness gate: it
drives the real runner (query extraction, coarse+fine tracking with
matching init, camera predictor, two-view initialization, full SfM solve
with in-graph BA), asserts the reconstruction is non-empty, and reports
AUC@30 of the recovered poses against the planted ground truth. A bench
run that reconstructs nothing exits nonzero. Any failure mode — hang,
backend-init error, pipeline crash — emits an explicit value-0 JSON line
(the driver must never see a bare traceback with no JSON).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

BASELINE_FPS = 8.0 / 20.0
METRIC = "sparse_8frame_e2e_frames_per_s"


def _emit(value, vs, detail, ok):
    print(json.dumps({
        "metric": METRIC,
        "value": round(value, 3), "unit": "frames/s",
        "vs_baseline": round(vs, 2), "detail": detail,
    }), flush=True)
    if not ok:
        sys.exit(1)


def _watchdog(seconds: float):
    """Emit an explicit failure line if the device never responds.

    The tunneled TPU backend can wedge (observed: a bare matmul blocking
    indefinitely). A silent hang would leave the driver with no record at
    all; this prints a value-0 JSON line naming the infra failure instead.
    """
    import os
    import threading

    def fire():
        print(json.dumps({
            "metric": METRIC,
            "value": 0.0, "unit": "frames/s", "vs_baseline": 0.0,
            "detail": {"error": f"device unresponsive for {seconds:.0f}s "
                                "(backend tunnel wedged?)"},
        }), flush=True)
        os._exit(1)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _run_config(scene, reps, measure_mfu=False, **overrides):
    """Build a runner with `overrides`, solve the scene, return stats."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vggsfm_tpu.geometry.metrics import pose_auc30
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
    from vggsfm_tpu.utils import mfu

    cfg = RunnerConfig(**overrides)
    runner = VGGSfMRunner(cfg)

    # device-resident frames: a production pipeline uploads each image
    # once (the axon tunnel inflates H2D to ~2 s/96 MB, which would
    # otherwise dominate the steady-state measurement)
    images = jnp.asarray(scene["images"])
    S = int(images.shape[0])

    t0 = time.time()
    out = runner.sparse_reconstruct(images)
    compile_s = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = runner.sparse_reconstruct(images)
        times.append(time.time() - t0)
    steady = float(np.median(times))

    valid_tracks = int(out["valid_tracks"].sum())
    stage_timings = {k: round(float(v), 2)
                     for k, v in out.get("timings", {}).items()}
    auc30 = float(np.asarray(pose_auc30(out["extrinsics"],
                                        scene["extrinsics"])))
    # gate at the demonstrated quality floor (AUC 1.0 since the
    # pose-refinement fixes; 0.85 leaves room for RNG drift only)
    ok = valid_tracks >= 100 and auc30 >= 0.85
    stats = {"fps": S / steady, "steady_s": round(steady, 3),
             "compile_s": round(compile_s, 1),
             "valid_tracks": valid_tracks,
             "auc30_vs_planted": round(auc30, 4), "ok": ok,
             # per-stage wall seconds of the LAST steady rep (stage
             # boundaries are async-dispatch wall clock, so stages that
             # only enqueue work attribute their device time to the next
             # syncing stage — indicative, not exact)
             "stage_timings": stage_timings}

    if measure_mfu:
        # one extra SYNC_TIMING rep: every hot jitted computation records
        # honest per-call device-inclusive seconds (transfer-synced — see
        # utils/mfu.py) + XLA cost-analysis FLOPs. Reported separately so
        # the headline timing keeps its pipeline overlap.
        #
        # The rep runs with jit_sfm OFF: the fused run_sfm program hides
        # BA inside one XLA computation (trace-time ledger calls are
        # skipped), so only the eager-composed solve can attribute
        # device seconds to ba_dense/ba_sparse (VERDICT r04 #6 — the
        # headline timing above keeps the fused default).
        import dataclasses

        runner_eager_sfm = VGGSfMRunner(
            dataclasses.replace(cfg, jit_sfm=False))
        # share the compiled stage programs + params — only the eager
        # SfM sub-kernels (triangulation/BA) are new compilations
        runner_eager_sfm._jit_cache = runner._jit_cache
        runner_eager_sfm._params = runner.params
        runner_eager_sfm._weights_loaded = runner._weights_loaded
        # warm rep first: the eager-SfM sub-kernels cold-compile on
        # their first call, which would otherwise be booked as BA
        # device seconds (observed 20 s of "ba_dense" that was compile)
        runner_eager_sfm.sparse_reconstruct(images)
        mfu.reset()
        mfu.SYNC_TIMING = True
        try:
            t0 = time.time()
            runner_eager_sfm.sparse_reconstruct(images)
            sync_total = time.time() - t0
            rep = mfu.flops_report()
        finally:
            mfu.SYNC_TIMING = False
        tracker = [rep[k] for k in ("fmaps", "coarse", "fine") if k in rep]
        ba = [rep[k] for k in ("ba_dense", "ba_sparse") if k in rep]

        def _agg(rows):
            fl = sum(r["total_flops"] or 0 for r in rows)
            sec = sum(r.get("device_s") or 0 for r in rows)
            return fl, sec

        tr_fl, tr_s = _agg(tracker)
        ba_fl, ba_s = _agg(ba)
        dev = jax.devices()[0]
        # dispatch floor: the SYNC pass times each call with a one-element
        # device->host pull, so every entry carries one tunnel round trip
        # (measured 30-430 ms depending on tunnel health) — small entries
        # read as floor, not compute; report the floor for interpretation
        tiny = jax.jit(lambda x: x + 1.0)
        np.asarray(tiny(jnp.zeros((8,))))
        floors = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(tiny(jnp.zeros((8,))))
            floors.append(time.time() - t0)
        stats["mfu"] = {
            "device_kind": getattr(dev, "device_kind", "unknown"),
            "peak_bf16_flops": mfu.peak_flops(dev),
            "dispatch_floor_s": round(min(floors), 4),
            "sync_rep_total_s": round(sync_total, 3),
            "per_computation": {
                k: {kk: (round(vv, 4) if isinstance(vv, float) else vv)
                    for kk, vv in v.items()} for k, v in rep.items()},
            "tracker_total_flops": tr_fl, "tracker_device_s":
                round(tr_s, 3),
            "mfu_tracker": (round(mfu.mfu(tr_fl, tr_s, dev), 4)
                            if mfu.mfu(tr_fl, tr_s, dev) else None),
            "ba_total_flops": ba_fl, "ba_device_s": round(ba_s, 3),
            "mfu_ba": (round(mfu.mfu(ba_fl, ba_s, dev), 4)
                       if mfu.mfu(ba_fl, ba_s, dev) else None),
        }
    return stats


def main():
    watchdog = _watchdog(45 * 60)
    t_start = time.time()
    try:
        import jax

        from vggsfm_tpu.utils.synth import render_two_plane_scene

        S, R = 8, 1024
        scene = render_two_plane_scene(num_frames=S, image_size=R)

        # HEADLINE: the reference's own 8-frame benchmark command
        # (README.md:243-246): query_frame_num=8, max_query_pts=4096,
        # query_method=aliked, fine tracking + comple_nonvis on.
        # ba_iters=1 mirrors the reference's own BA_iters: 1 default
        # (reference cfgs/demo.yaml:23) — the baseline's 20 s quote runs
        # that config. (The repo's production default stays ba_iters=2:
        # +0.04 min-AUC on noisy scenes, see ROADMAP "quality gates".)
        matched = _run_config(
            scene, reps=2, measure_mfu=True, img_size=R,
            query_frame_num=8, max_query_pts=4096, query_method="aliked",
            fine_tracking=True, comple_nonvis=True,
            robust_refine=2, ba_iters=1)

        detail = {"matched_workload": matched,
                  "workload": "query_frame_num=8 max_query_pts=4096 "
                              "query_method=aliked (README.md:243-246)",
                  "n_query_pts": 4096, "image": [R, R],
                  "device": str(jax.devices()[0])}

        # secondary: the light 1-query config benched in rounds 1-2,
        # for round-over-round comparability. Skipped if the matched
        # run left too little watchdog headroom.
        if time.time() - t_start < 28 * 60:
            light = _run_config(
                scene, reps=2, img_size=R, query_frame_num=1,
                max_query_pts=4096, query_method="sift+harris",
                fine_tracking=True, comple_nonvis=False,
                robust_refine=2, ba_iters=2)
            detail["light_1query"] = light
        else:
            detail["light_1query"] = "skipped (watchdog headroom)"

        watchdog.cancel()
        fps = matched["fps"] if matched["ok"] else 0.0
        _emit(fps, fps / BASELINE_FPS, detail, matched["ok"])
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — must emit JSON on ANY error
        watchdog.cancel()
        _emit(0.0, 0.0,
              {"error": f"{type(e).__name__}: {e}",
               "traceback": traceback.format_exc()[-1500:]}, ok=False)


if __name__ == "__main__":
    main()
