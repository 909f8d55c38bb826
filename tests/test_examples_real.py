"""Real-image end-to-end gate on the reference's kitchen example scene.

The reference ships four real photo scenes and drives them in its README
(reference README.md:72-89, examples/kitchen = 25 frames); SURVEY §7 names
kitchen as the minimum end-to-end slice. No ground truth ships with the
scenes, so the gate is internal consistency: every frame registers, a
substantial track set survives filtering, and the surviving observations
reproject tightly. Real photos exercise what synthetic planted scenes
cannot — photometric noise, repeated texture, real keypoint distributions.
"""

import pathlib

import numpy as np
import pytest

KITCHEN = pathlib.Path("/root/reference/examples/kitchen")


@pytest.mark.slow
@pytest.mark.skipif(not KITCHEN.exists(),
                    reason="reference example scenes not present")
def test_kitchen_six_frames_reconstructs():
    from vggsfm_tpu.datasets.demo_loader import DemoLoader
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

    loader = DemoLoader(str(KITCHEN), img_size=256)
    data = loader.load()
    imgs = data["images"][:6]
    assert imgs.shape == (6, 256, 256, 3)

    cfg = RunnerConfig(img_size=256, query_frame_num=1, max_query_pts=512,
                       query_method="aliked", fine_tracking=False,
                       comple_nonvis=False, robust_refine=1, ba_iters=1)
    pred = VGGSfMRunner(cfg).sparse_reconstruct(imgs)

    valid_frames = int(np.asarray(pred["valid_frame_mask"]).sum())
    valid_tracks = int(np.asarray(pred["valid_tracks"]).sum())
    assert valid_frames == 6, f"only {valid_frames}/6 frames registered"
    assert valid_tracks >= 100, f"only {valid_tracks} valid tracks"

    # reproject the surviving observations (CPU-measured baseline:
    # ~300 tracks at ~1.2 px mean — gate leaves room for RNG drift)
    extr = np.asarray(pred["extrinsics"])
    intr = np.asarray(pred["intrinsics"])
    pts = np.asarray(pred["points3d"])
    track = np.asarray(pred["pred_track"])[0]
    obs = (np.asarray(pred["valid_2d_mask"])
           & np.asarray(pred["valid_tracks"])[None])
    cam = np.einsum("sij,nj->sni", extr[:, :, :3], pts) + extr[:, None, :, 3]
    z = cam[..., 2]
    ok = obs & (z > 1e-6)
    uv = (np.einsum("sij,snj->sni", intr[:, :2, :2],
                    cam[..., :2] / np.where(z[..., None] > 1e-6,
                                            z[..., None], 1.0))
          + intr[:, None, :2, 2])
    err = np.linalg.norm(uv - track, axis=-1)[ok]
    assert err.size >= 300, f"only {err.size} valid observations"
    assert float(err.mean()) < 4.0, f"mean reproj {err.mean():.2f} px"
