#!/usr/bin/env python
"""IMC benchmark harness: bags -> sparse runner -> AUC@30 table.

Drives `IMCDataset` (IMC phototourism bag lists + h5 calibration,
vggsfm_tpu/datasets/imc.py) through the full sparse pipeline and scores
every bag with `evaluate_bag` (pairwise relative rot/trans errors,
AUC@30 — parity: vggsfm/utils/metric.py:107-218). Emits a JSON table with
per-bag AUC and the per-stage time breakdown the runner records
(timings are honest wall-clock including device->host sync).

Usage:
  python imc_eval.py --imc-dir /path/to/IMC --out imc_results.json \
      [--bags bag_5_british_museum ...] [--checkpoint vggsfm_v2_0_0.bin]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--imc-dir", required=True)
    ap.add_argument("--bags", nargs="*", default=None,
                    help="bag names to run (default: all)")
    ap.add_argument("--img-size", type=int, default=1024)
    ap.add_argument("--query-frame-num", type=int, default=3)
    ap.add_argument("--max-query-pts", type=int, default=4096)
    ap.add_argument("--query-method", default="aliked")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--no-fine-tracking", action="store_true")
    ap.add_argument("--calib-ext", default=".h5", choices=[".h5", ".npz"],
                    help="calibration file format (npz for fixtures)")
    ap.add_argument("--exclude-london-bridge", action="store_true")
    ap.add_argument("--shared-camera", action="store_true")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a JAX profiler trace per bag under here")
    ap.add_argument("--submission-dir", default=None,
                    help="write per-bag pose h5 files (IMC submission "
                         "layout) here")
    ap.add_argument("--pack-submission", default=None,
                    help="also write full IMC method directories "
                         "(keypoints/scores/matches h5 + COLMAP model, "
                         "datasets/imc_submission.py) under this base")
    ap.add_argument("--out", default=None, help="write JSON results here")
    args = ap.parse_args(argv)

    from vggsfm_tpu.datasets.imc import IMCDataset, evaluate_bag
    from vggsfm_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

    ds = IMCDataset(args.imc_dir, img_size=args.img_size,
                    exclude_london_bridge=args.exclude_london_bridge,
                    calib_ext=args.calib_ext)
    names = args.bags or ds.sequence_names()
    if not names:
        print("no bags found under", args.imc_dir, file=sys.stderr)
        return 1

    cfg = RunnerConfig(img_size=args.img_size,
                       query_frame_num=args.query_frame_num,
                       max_query_pts=args.max_query_pts,
                       query_method=args.query_method,
                       shared_camera=args.shared_camera,
                       fine_tracking=not args.no_fine_tracking,
                       checkpoint=args.checkpoint,
                       profile_dir=args.profile_dir)
    runner = VGGSfMRunner(cfg)

    results = {"bags": {}, "config": {
        "img_size": args.img_size, "query_frame_num": args.query_frame_num,
        "max_query_pts": args.max_query_pts,
        "query_method": args.query_method,
        "checkpoint": args.checkpoint}}
    aucs = []
    for name in names:
        data = ds.load_bag(name)
        t0 = time.time()
        out = runner.sparse_reconstruct(data["images"],
                                        image_names=data["image_names"])
        wall = time.time() - t0
        scores = evaluate_bag(out["extrinsics"], data["gt_extrinsics"])
        if args.submission_dir:
            from vggsfm_tpu.datasets.imc import save_pose_submission

            save_pose_submission(args.submission_dir, name,
                                 data["image_names"], out["extrinsics"])
        if args.pack_submission:
            from vggsfm_tpu.datasets.imc_submission import (
                pack_scene_submission,
            )

            pack_scene_submission(
                args.pack_submission, "imc", name, "vggsfm_tpu",
                data["image_names"], out,
                image_size=(args.img_size, args.img_size))
        m = scores["pair_mask"]
        row = {
            "num_frames": int(len(data["images"])),
            "auc30": scores["auc30"],
            "rot_err_med_deg": (float(np.median(scores["rot_err_deg"][m]))
                                if m.any() else None),
            "trans_err_med_deg": (float(np.median(
                scores["trans_err_deg"][m])) if m.any() else None),
            "valid_tracks": int(np.asarray(out["valid_tracks"]).sum()),
            "wall_s": round(wall, 2),
            "stage_s": {k: round(float(v), 3)
                        for k, v in out["timings"].items()},
        }
        results["bags"][name] = row
        aucs.append(scores["auc30"])
        print(f"{name}: AUC@30={row['auc30']:.4f} "
              f"frames={row['num_frames']} tracks={row['valid_tracks']} "
              f"wall={wall:.1f}s", file=sys.stderr)

    results["mean_auc30"] = float(np.mean(aucs))
    text = json.dumps(results, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
