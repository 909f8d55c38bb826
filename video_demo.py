"""CLI video demo: windowed incremental reconstruction of a frame folder.

Parity: reference video_demo.py (hydra entry over VideoRunner,
cfgs/video_demo.yaml:6-14 window knobs).

Usage:
    python video_demo.py /path/to/frames --output OUT \
        [--init-window 16] [--window 8] [--joint-ba-interval 4]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scene_dir")
    p.add_argument("--output", default=None)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--init-window", type=int, default=16)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--joint-ba-interval", type=int, default=4)
    p.add_argument("--max-query-pts", type=int, default=1024)
    p.add_argument("--query-method", default="sift")
    p.add_argument("--camera-type", default="SIMPLE_PINHOLE",
                   choices=["SIMPLE_PINHOLE", "SIMPLE_RADIAL"],
                   help="SIMPLE_RADIAL carries a shared radial "
                        "coefficient through the incremental map "
                        "(the reference's video default)")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--state-checkpoint", default=None,
                   help="path prefix for pipeline-state checkpoints "
                        "(saved after every joint BA)")
    p.add_argument("--resume", default=None,
                   help="resume from a prior --state-checkpoint prefix")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from vggsfm_tpu.datasets.demo_loader import DemoLoader
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
    from vggsfm_tpu.video import VideoConfig, VideoRunner

    scfg = RunnerConfig(img_size=args.img_size, query_frame_num=1,
                        max_query_pts=args.max_query_pts,
                        query_method=args.query_method,
                        camera_type=args.camera_type,
                        checkpoint=args.checkpoint)
    vcfg = VideoConfig(init_window_size=args.init_window,
                       window_size=args.window,
                       joint_ba_interval=args.joint_ba_interval,
                       max_query_pts=args.max_query_pts,
                       query_method=args.query_method,
                       camera_type=args.camera_type)
    runner = VideoRunner(VGGSfMRunner(scfg), vcfg)

    data = DemoLoader(args.scene_dir, img_size=args.img_size).load()
    out_dir = args.output or args.scene_dir
    preds = runner.run(data["images"], output_dir=out_dir,
                       resume_from=args.resume,
                       checkpoint_path=args.state_checkpoint,
                       image_names=data["image_names"],
                       crop_params=data["crop_params"])
    print(json.dumps({
        "frames": int(preds["extrinsics"].shape[0]),
        "registered": int(preds["registered"].sum()),
        "points": int(preds["num_points"]),
        "observations": int(preds["num_observations"]),
        "output": out_dir,
    }))
    return preds


if __name__ == "__main__":
    main()
