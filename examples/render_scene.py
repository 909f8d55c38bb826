#!/usr/bin/env python
"""Render a synthetic demo scene with planted ground-truth cameras.

The reference distributes photo scene folders under examples/ (kitchen,
statue, ...); this environment is zero-egress, so the runnable example is
the synthetic two-plane oracle scene instead — real parallax, trackable
texture, and a COLMAP ground-truth model to score against:

  python examples/render_scene.py --out examples/two_plane  [--frames 8]
  python demo.py examples/two_plane --load-gt --glb

The written sparse/ model holds the planted cameras, so `--load-gt`
reports a meaningful AUC@30 for any pipeline configuration.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="examples/two_plane")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from PIL import Image

    from vggsfm_tpu.io import arrays_to_reconstruction, write_model
    from vggsfm_tpu.utils.synth import render_two_plane_scene

    scene = render_two_plane_scene(num_frames=args.frames,
                                   image_size=args.size, seed=args.seed)
    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    names = []
    for i, im in enumerate(scene["images"]):
        name = f"frame_{i:04d}.png"
        Image.fromarray((im * 255).astype(np.uint8)).save(
            os.path.join(img_dir, name))
        names.append(name)

    # planted cameras as a COLMAP ground-truth model (for --load-gt);
    # a handful of scene points so the model is well-formed
    S = args.frames
    extr = scene["extrinsics"].astype(np.float64)
    intr = scene["intrinsics"].astype(np.float64)
    rng = np.random.default_rng(args.seed)
    pts = np.column_stack([rng.uniform(-1.0, 1.0, 64),
                           rng.uniform(-1.0, 1.0, 64),
                           rng.uniform(2.0, 4.0, 64)])
    tracks = np.zeros((S, len(pts), 2))
    for s in range(S):
        Xc = (extr[s, :, :3] @ pts.T).T + extr[s, :, 3]
        uv = (intr[s] @ Xc.T).T
        tracks[s] = uv[:, :2] / uv[:, 2:]
    inb = ((tracks >= 0) & (tracks < args.size)).all(axis=-1)
    rec = arrays_to_reconstruction(pts, extr, intr, tracks, inb,
                                   (args.size, args.size),
                                   image_names=names)
    # GT lives in sparse/0 (the COLMAP convention the loader checks
    # first) so a demo.py run writing its predictions to SCENE/sparse
    # cannot clobber it
    write_model(rec, os.path.join(args.out, "sparse", "0"), ext=".bin")
    print(f"wrote {S} frames + GT model under {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
