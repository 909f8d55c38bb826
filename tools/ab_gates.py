"""A/B the quality-gate defaults against the reference's (VERDICT r3 #6).

Grid: fmat_thres (preliminary epipolar Sampson gate, px) x
init_max_reproj_error (init-pair triangulation gate, px), evaluated on
planted-track scenes with increasing observation noise and outliers —
the regime the tight gates were never tested in. Reference values:
fmat_thres=4.0, init_max_reproj_error=4.0 (reference cfgs/demo.yaml:32,34);
repo round-3 defaults: 0.5 / 0.5.

Runs on CPU (forces jax_platforms=cpu like tests/conftest.py).
Usage: python tools/ab_gates.py [--seeds 3]
"""

from __future__ import annotations

import argparse
import json
import sys

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_one(rng, fmat_thres, init_reproj, noise_px, outlier_frac,
            ba_iters=2):
    from test_sfm import make_scene

    from vggsfm_tpu.geometry.metrics import pose_auc30
    from vggsfm_tpu.sfm import SfmConfig, run_sfm
    from vggsfm_tpu.twoview import estimate_preliminary_cameras

    extr, intr, X, tracks, vis = make_scene(
        rng, S=6, N=300, noise_px=noise_px, outlier_frac=outlier_frac)
    track_j = jnp.asarray(tracks, jnp.float32)[None]
    vis_j = jnp.asarray(vis)[None]

    pre = estimate_preliminary_cameras(
        track_j, vis_j, 640, 480, jax.random.PRNGKey(1),
        max_error=fmat_thres, max_ransac_iters=256, lo_num=32)

    extr_n = extr.copy()
    extr_n[1:, :, 3] += rng.normal(scale=0.08, size=(extr.shape[0] - 1, 3))
    cfg = SfmConfig(init_max_reproj_error=init_reproj,
                    max_reproj_error=4.0, robust_refine=2,
                    ba_iters=ba_iters, ba_max_iterations=15,
                    max_ransac_iters=128)
    out = run_sfm(jnp.asarray(extr_n, jnp.float32),
                  jnp.asarray(intr, jnp.float32), track_j[0], vis_j[0],
                  (640, 480), cfg=cfg,
                  fmat_inlier_mask=pre["fmat_inlier_mask"][0])
    auc = float(pose_auc30(jnp.asarray(out["extrinsics"]),
                           jnp.asarray(extr, jnp.float32)))
    valid = int(np.asarray(out["valid_tracks"]).sum())
    return auc, valid


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    args = p.parse_args()

    grid = [(0.5, 0.5), (4.0, 0.5), (0.5, 4.0), (4.0, 4.0)]
    noises = [(0.3, 0.1), (1.0, 0.2), (2.0, 0.3)]
    results = {}
    for fm, ir in grid:
        for noise, ofrac in noises:
            aucs, valids = [], []
            for s in range(args.seeds):
                rng = np.random.default_rng(500 + s)
                auc, valid = run_one(rng, fm, ir, noise, ofrac)
                aucs.append(auc)
                valids.append(valid)
            key = f"fmat={fm}_initreproj={ir}_noise={noise}px_out={ofrac}"
            results[key] = {"auc30_mean": round(float(np.mean(aucs)), 4),
                            "auc30_min": round(float(np.min(aucs)), 4),
                            "valid_tracks_mean": int(np.mean(valids))}
            print(key, "->", results[key], flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
