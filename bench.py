"""End-to-end benchmark: 8-frame sparse reconstruction on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference quotes ~20 s end-to-end for an 8-frame sparse-view
scene on one GPU (README.md:243-246, query_frame_num=8, max_query_pts=4096)
=> 0.4 frames/s. This bench drives the real runner (VGGSfMRunner: query
extraction, coarse+fine tracking with memory chunking, camera predictor,
two-view initialization, full SfM solve with in-graph BA) on a synthetic
textured 8-frame scene at the reference's default shapes and reports
steady-state frames/s after compile (persistent XLA cache).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 8.0 / 20.0


def synthetic_images(S: int, R: int, seed: int = 0) -> np.ndarray:
    """Textured synthetic views: shifted multi-scale value noise so the
    extractors find real structure."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(R * 2, R * 2, 3)).astype(np.float32)
    # cheap smoothing for blob structure
    for _ in range(2):
        base = 0.25 * (np.roll(base, 1, 0) + np.roll(base, -1, 0)
                       + np.roll(base, 1, 1) + np.roll(base, -1, 1))
    images = np.zeros((S, R, R, 3), np.float32)
    for s in range(S):
        off = 8 * s
        images[s] = base[off: off + R, off: off + R]
    return images


def main():
    import jax

    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

    S, R = 8, 1024
    images = synthetic_images(S, R)

    cfg = RunnerConfig(img_size=R, query_frame_num=1, max_query_pts=4096,
                       query_method="sift", fine_tracking=True,
                       comple_nonvis=False, robust_refine=2, ba_iters=2)
    runner = VGGSfMRunner(cfg)

    t0 = time.time()
    out = runner.sparse_reconstruct(images)
    compile_s = time.time() - t0

    times = []
    for _ in range(2):
        t0 = time.time()
        out = runner.sparse_reconstruct(images)
        times.append(time.time() - t0)
    steady = float(np.median(times))
    fps = S / steady

    print(json.dumps({
        "metric": "sparse_8frame_e2e_frames_per_s",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "detail": {"steady_s": round(steady, 3),
                   "compile_s": round(compile_s, 1),
                   "valid_tracks": int(out["valid_tracks"].sum()),
                   "n_query_pts": cfg.max_query_pts, "image": [R, R],
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
