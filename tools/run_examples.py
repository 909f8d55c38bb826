"""Run the four reference example scenes end-to-end and report stats.

The reference drives these scenes in its README (reference README.md:72-89):
examples/{kitchen,statue,british_museum,cake} — 25/9/10/8 real photos. No
ground truth ships with them, so the report is internal-consistency: frames
registered, valid tracks, mean/median reprojection error over the valid
observations, and wall-clock. Results land in EXAMPLES.md + examples_report.json.

Run on the real TPU chip (serialize with any other TPU client):

    python tools/run_examples.py [--out /tmp/examples_out] [--scenes kitchen]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REF = pathlib.Path("/root/reference/examples")
REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def reprojection_errors(pred):
    """Pixel reprojection errors of the valid observations.

    Projects points3d with the solved cameras (including SIMPLE_RADIAL
    extra params when present) and compares against the 2D tracks, over
    valid_2d_mask & valid_tracks.
    """
    import numpy as np

    extr = np.asarray(pred["extrinsics"])  # (S, 3, 4)
    intr = np.asarray(pred["intrinsics"])  # (S, 3, 3)
    pts = np.asarray(pred["points3d"])  # (N, 3)
    track = np.asarray(pred["pred_track"])[0]  # (S, N, 2)
    obs = (np.asarray(pred["valid_2d_mask"])
           & np.asarray(pred["valid_tracks"])[None]
           & np.asarray(pred["valid_frame_mask"])[:, None])
    extra = pred.get("extra_params")

    cam = np.einsum("sij,nj->sni", extr[:, :, :3], pts) + extr[:, None, :, 3]
    z = cam[..., 2]
    ok = obs & (z > 1e-6)
    xy = cam[..., :2] / np.where(z[..., None] > 1e-6, z[..., None], 1.0)
    if extra is not None:
        k1 = np.asarray(extra).reshape(-1)[:, None, None]
        r2 = np.sum(xy * xy, axis=-1, keepdims=True)
        xy = xy * (1.0 + k1 * r2)
    uv = (np.einsum("sij,snj->sni", intr[:, :2, :2], xy)
          + intr[:, None, :2, 2])
    err = np.linalg.norm(uv - track, axis=-1)
    return err[ok]


def run_scene(scene_dir: str, out_dir: str, img_size: int, query_frames: int,
              max_query_pts: int, camera_type: str):
    import numpy as np

    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

    cfg = RunnerConfig(
        img_size=img_size, query_frame_num=query_frames,
        max_query_pts=max_query_pts, query_method="aliked",
        fine_tracking=True, comple_nonvis=True, camera_type=camera_type,
        shared_camera=True)
    runner = VGGSfMRunner(cfg)
    t0 = time.time()
    pred = runner.run_scene(scene_dir, output_dir=out_dir)
    total = time.time() - t0

    err = reprojection_errors(pred)
    S = int(pred["extrinsics"].shape[0])
    stats = {
        "frames": S,
        "frames_registered": int(np.asarray(pred["valid_frame_mask"]).sum()),
        "valid_tracks": int(np.asarray(pred["valid_tracks"]).sum()),
        "valid_observations": int(err.size),
        "mean_reproj_px": round(float(err.mean()), 3) if err.size else None,
        "median_reproj_px": (round(float(np.median(err)), 3)
                             if err.size else None),
        "total_time_s": round(total, 1),
        "fps_total": round(S / total, 3),
        "pipeline_time_s": round(pred["total_time"], 1),
        "timings": {k: round(float(v), 2)
                    for k, v in pred["timings"].items()},
    }
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/examples_out")
    ap.add_argument("--scenes", nargs="*",
                    default=["kitchen", "statue", "british_museum", "cake"])
    ap.add_argument("--img-size", type=int, default=1024)
    ap.add_argument("--query-frames", type=int, default=3)
    ap.add_argument("--max-query-pts", type=int, default=4096)
    ap.add_argument("--camera-type", default="SIMPLE_RADIAL")
    ap.add_argument("--report", default=str(REPO / "examples_report.json"))
    args = ap.parse_args()

    report = {"config": {
        "img_size": args.img_size, "query_frame_num": args.query_frames,
        "max_query_pts": args.max_query_pts, "query_method": "aliked",
        "camera_type": args.camera_type, "shared_camera": True,
        "fine_tracking": True, "comple_nonvis": True}}
    for name in args.scenes:
        scene = REF / name
        out_dir = pathlib.Path(args.out) / name
        out_dir.mkdir(parents=True, exist_ok=True)
        print(f"=== {name} ===", flush=True)
        try:
            stats = run_scene(str(scene), str(out_dir), args.img_size,
                              args.query_frames, args.max_query_pts,
                              args.camera_type)
        except Exception as e:  # noqa: BLE001 — keep going, record failure
            import traceback
            stats = {"error": f"{type(e).__name__}: {e}",
                     "traceback": traceback.format_exc()[-1200:]}
        report[name] = stats
        print(json.dumps({name: stats}), flush=True)
        pathlib.Path(args.report).write_text(json.dumps(report, indent=2))
    print("report written to", args.report)


if __name__ == "__main__":
    main()
