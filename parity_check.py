#!/usr/bin/env python
"""Golden-parity harness: checkpoint conversion + scene run + fixture diff.

The moment a reference checkpoint (``vggsfm_v2_0_0.bin``, see
vggsfm/models/vggsfm.py:37-51) is available, this one command produces a
parity report:

  1. **Conversion audit** — loads the torch state_dict and converts it with
     `convert_vggsfm_checkpoint`, *instrumented*: every key the converter
     reads is recorded, and the report lists missing keys (KeyError — the
     checkpoint doesn't match the expected naming) and unconsumed keys
     (weights silently dropped). Either list being non-empty fails the run:
     conversion must break loudly, not at inference.
  2. **Scene run** — runs the sparse pipeline on a scene directory
     (``--scene``, DemoLoader layout) or on the built-in synthetic oracle
     scene, with ``matching_init`` disabled so the behavior is the
     reference's (tracks start at the query point and the trained tracker
     walks them; base_track_predictor.py:104).
  3. **Fixture diff** — if ``--fixtures DIR`` holds golden arrays
     (``extrinsics.npy``, ``points3d.npy``, ``valid_tracks.npy`` exported
     from a reference run), reports pose AUC@30 and point-cloud RMSE
     against them; otherwise (``--write-fixtures``) stores this run as the
     fixture for future regression diffs.

Exit status is nonzero on conversion mismatch or (when fixtures exist) on
AUC below ``--min-auc``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


class _RecordingDict(dict):
    """dict that records which keys were read and which were missing."""

    def __init__(self, base):
        super().__init__(base)
        self.consumed = set()
        self.missing = set()

    def __getitem__(self, k):
        try:
            v = super().__getitem__(k)
        except KeyError:
            self.missing.add(k)
            raise
        self.consumed.add(k)
        return v

    def __contains__(self, k):
        hit = super().__contains__(k)
        if hit:
            self.consumed.add(k)
        return hit


def audit_conversion(state_dict):
    """Convert with bookkeeping. Returns (params, report dict)."""
    from vggsfm_tpu.models.convert import convert_vggsfm_checkpoint

    rec = _RecordingDict(state_dict)
    err = None
    params = None
    try:
        params = convert_vggsfm_checkpoint(rec)
    except KeyError as e:  # first missing key aborts conversion
        err = str(e)
    unconsumed = sorted(set(rec) - rec.consumed)
    report = {
        "total_keys": len(rec),
        "consumed_keys": len(rec.consumed),
        "missing_keys": sorted(rec.missing),
        "unconsumed_keys": unconsumed,
        "error": err,
        "ok": err is None and not rec.missing and not unconsumed,
    }
    return params, report


def run_scene(params, scene_dir, img_size, query_method, max_query_pts,
              query_frame_num):
    import jax.numpy as jnp

    from vggsfm_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

    cfg = RunnerConfig(img_size=img_size, query_method=query_method,
                       max_query_pts=max_query_pts,
                       query_frame_num=query_frame_num,
                       # reference-parity behavior: trust the trained
                       # tracker, no weights-free extras
                       matching_init=False, camera_init="neural")
    runner = VGGSfMRunner(cfg)
    runner._params = params
    runner._weights_loaded = True

    gt_extr = None
    if scene_dir:
        from vggsfm_tpu.datasets.demo_loader import DemoLoader

        data = DemoLoader(scene_dir, img_size=img_size).load()
        # sparse_reconstruct takes (S, R, R, 3) and batches internally
        out = runner.sparse_reconstruct(
            data["images"], masks=data.get("masks"),
            image_names=data["image_names"])
    else:
        from vggsfm_tpu.utils.synth import render_two_plane_scene

        scene = render_two_plane_scene(num_frames=8, image_size=img_size)
        gt_extr = scene["extrinsics"]
        out = runner.sparse_reconstruct(scene["images"])

    res = {
        "extrinsics": np.asarray(out["extrinsics"]),
        "intrinsics": np.asarray(out["intrinsics"]),
        "points3d": np.asarray(out["points3d"]),
        "valid_tracks": np.asarray(out["valid_tracks"]),
    }
    if gt_extr is not None:
        from vggsfm_tpu.geometry.metrics import pose_auc30

        res["auc30_vs_planted"] = float(np.asarray(
            pose_auc30(jnp.asarray(res["extrinsics"]), jnp.asarray(gt_extr))))
    return res


def diff_fixtures(res, fixtures):
    import jax.numpy as jnp

    from vggsfm_tpu.geometry.metrics import pose_auc30, relative_pose_errors

    gold_extr = np.load(os.path.join(fixtures, "extrinsics.npy"))
    report = {
        "auc30_vs_fixture": float(np.asarray(pose_auc30(
            jnp.asarray(res["extrinsics"]), jnp.asarray(gold_extr)))),
    }
    r_err, t_err, mask = relative_pose_errors(
        jnp.asarray(res["extrinsics"]), jnp.asarray(gold_extr))
    m = np.asarray(mask)
    if m.any():
        report["rot_err_med_deg"] = float(np.median(np.asarray(r_err)[m]))
        report["trans_err_med_deg"] = float(np.median(np.asarray(t_err)[m]))
    vfile = os.path.join(fixtures, "valid_tracks.npy")
    if os.path.exists(vfile):
        gold_valid = int(np.load(vfile).sum())
        report["valid_tracks_fixture"] = gold_valid
        report["valid_tracks_ratio"] = (
            float(res["valid_tracks"].sum()) / max(gold_valid, 1))
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True,
                    help="torch state_dict (.bin/.pt) of the reference model")
    ap.add_argument("--scene", default=None,
                    help="scene dir (DemoLoader layout); default: synthetic "
                         "oracle scene")
    ap.add_argument("--fixtures", default=None,
                    help="dir with golden extrinsics.npy etc. to diff against")
    ap.add_argument("--write-fixtures", action="store_true",
                    help="store this run's outputs as the golden fixtures")
    ap.add_argument("--img-size", type=int, default=1024)
    ap.add_argument("--query-method", default="aliked")
    ap.add_argument("--max-query-pts", type=int, default=2048)
    ap.add_argument("--query-frame-num", type=int, default=3)
    # gate at the bench's demonstrated quality floor (bench.py gates its
    # reconstruction at 0.85; the parity gate must not be weaker)
    ap.add_argument("--min-auc", type=float, default=0.85)
    ap.add_argument("--convert-only", action="store_true",
                    help="stop after the conversion audit")
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args(argv)

    import torch

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    params_np, conv_report = audit_conversion(sd)
    report = {"conversion": conv_report}

    if not conv_report["ok"]:
        _emit(report, args.out)
        print("FAIL: checkpoint conversion mismatch", file=sys.stderr)
        return 1

    if args.convert_only:
        _emit(report, args.out)
        return 0

    import jax
    import jax.numpy as jnp

    params = {k: jax.tree.map(jnp.asarray, v) for k, v in params_np.items()}
    res = run_scene(params, args.scene, args.img_size, args.query_method,
                    args.max_query_pts, args.query_frame_num)
    report["scene"] = {
        "valid_tracks": int(res["valid_tracks"].sum()),
        "num_frames": int(res["extrinsics"].shape[0]),
    }
    if "auc30_vs_planted" in res:
        report["scene"]["auc30_vs_planted"] = res["auc30_vs_planted"]

    rc = 0
    if args.fixtures and not args.write_fixtures:
        report["fixture_diff"] = diff_fixtures(res, args.fixtures)
        if report["fixture_diff"]["auc30_vs_fixture"] < args.min_auc:
            rc = 1
    elif args.fixtures and args.write_fixtures:
        os.makedirs(args.fixtures, exist_ok=True)
        for k in ("extrinsics", "intrinsics", "points3d", "valid_tracks"):
            np.save(os.path.join(args.fixtures, f"{k}.npy"), res[k])
        report["fixtures_written"] = args.fixtures

    _emit(report, args.out)
    return rc


def _emit(report, out):
    text = json.dumps(report, indent=2)
    print(text)
    if out:
        with open(out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    sys.exit(main())
