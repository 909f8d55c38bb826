"""IMC benchmark packaging: features / matches / model import-export.

Parity surface: the reference vendors the IMC2020 toolkit's path + IO
helpers (datasets/imc_helper.py:767-1148 — get_feature_path/get_kp_file/
get_match_file/get_geom_path and friends, plus the h5 readers/writers).
Those compose a method directory tree the benchmark evaluates:

    <base>/<dataset>/<scene>/<method_label>/
        keypoints.h5      one (N, 2) dataset per image stem
        descriptors.h5    one (N, D) dataset per image stem
        scores.h5         one (N,)   dataset per image stem
        matches.h5        one (2, M) dataset per "stemA-stemB" pair
        model/            COLMAP cameras/images/points3D

This module rebuilds that surface against our pipeline outputs: tracks
give per-image keypoints, track co-visibility gives pairwise matches, and
the reconstruction exports through io.colmap. The labyrinth of per-stage
cost/filter/cne paths in the reference exists to coordinate the original
multi-method challenge harness and has no role in an SfM submission; the
paths kept here are the ones the benchmark's multiview track consumes.
"""

from __future__ import annotations

import os

import numpy as np

from vggsfm_tpu.datasets.imc import load_h5, save_h5


def submission_paths(base: str, dataset: str, scene: str,
                     method_label: str) -> dict:
    """Standard method-directory layout (imc_helper.py:838-1106)."""
    root = os.path.join(base, dataset, scene, method_label)
    return {
        "root": root,
        "keypoints": os.path.join(root, "keypoints.h5"),
        "descriptors": os.path.join(root, "descriptors.h5"),
        "scores": os.path.join(root, "scores.h5"),
        "matches": os.path.join(root, "matches.h5"),
        "model": os.path.join(root, "model"),
    }


def _stem(name: str) -> str:
    return os.path.splitext(os.path.basename(name))[0]


def pair_key(name_a: str, name_b: str) -> str:
    """Canonical 'stemA-stemB' pair key (sorted, imc_helper convention)."""
    a, b = sorted([_stem(name_a), _stem(name_b)])
    return f"{a}-{b}"


def features_from_tracks(image_names: list, tracks, vis_mask,
                         scores=None) -> tuple[dict, dict]:
    """Per-image keypoints/scores from the (S, N, 2) track tensor.

    Every track visible in an image contributes its 2D location there;
    the keypoint INDEX within an image equals the track index, which is
    what makes `matches_from_tracks` consistent with these files.
    Invisible tracks keep a row (NaN) so indices stay aligned.
    """
    tracks = np.asarray(tracks)
    vis = np.asarray(vis_mask, bool)
    kps, scs = {}, {}
    for i, name in enumerate(image_names):
        xy = np.where(vis[i][:, None], tracks[i], np.nan)
        kps[_stem(name)] = xy.astype(np.float32)
        s = (np.asarray(scores)[i] if scores is not None
             else vis[i].astype(np.float32))
        scs[_stem(name)] = np.where(vis[i], s, 0.0).astype(np.float32)
    return kps, scs


def matches_from_tracks(image_names: list, vis_mask,
                        max_pairs: int | None = None) -> dict:
    """(2, M) index matches per co-visible image pair from track
    co-visibility (keypoint index == track index, see above)."""
    vis = np.asarray(vis_mask, bool)
    S = vis.shape[0]
    out = {}
    for i in range(S):
        for j in range(i + 1, S):
            both = np.nonzero(vis[i] & vis[j])[0]
            if len(both) == 0:
                continue
            key = pair_key(image_names[i], image_names[j])
            out[key] = np.stack([both, both]).astype(np.int64)
            if max_pairs is not None and len(out) >= max_pairs:
                return out
    return out


def pack_scene_submission(base: str, dataset: str, scene: str,
                          method_label: str, image_names: list,
                          predictions: dict, image_size,
                          descriptors: dict | None = None) -> dict:
    """Write one scene's full IMC method directory from runner output.

    `predictions` is `sparse_reconstruct`'s dict (pred_track, pred_vis /
    valid_2d_mask, pred_score, extrinsics, intrinsics, points3d...);
    `image_size` is (width, height) of the runner's pixel space.
    Returns the written paths. COLMAP model export uses io.colmap via
    io.bridge (same arrays the normal export path writes).
    """
    paths = submission_paths(base, dataset, scene, method_label)
    os.makedirs(paths["root"], exist_ok=True)

    track = np.asarray(predictions["pred_track"])[0]
    vis2d = np.asarray(predictions["valid_2d_mask"])
    valid = predictions.get("valid_tracks")
    if valid is not None:
        vis2d = vis2d & np.asarray(valid, bool)[None]
    score = predictions.get("pred_score")
    score = np.asarray(score)[0] if score is not None else None

    kps, scs = features_from_tracks(image_names, track, vis2d, score)
    save_h5(kps, paths["keypoints"])
    save_h5(scs, paths["scores"])
    if descriptors is not None:
        save_h5({_stem(k): np.asarray(v)
                 for k, v in descriptors.items()}, paths["descriptors"])
    save_h5(matches_from_tracks(image_names, vis2d), paths["matches"])

    from vggsfm_tpu.io import arrays_to_reconstruction, write_model

    os.makedirs(paths["model"], exist_ok=True)
    rec = arrays_to_reconstruction(
        np.asarray(predictions["points3d"]),
        np.asarray(predictions["extrinsics"]),
        np.asarray(predictions["intrinsics"]),
        track, vis2d, image_size,
        image_names=[os.path.basename(n) for n in image_names],
        extra_params=predictions.get("extra_params"),
        colors=(None if predictions.get("colors") is None else
                np.clip(np.asarray(predictions["colors"]) * 255,
                        0, 255).astype(np.uint8)))
    write_model(rec, paths["model"])
    return paths


def load_scene_submission(base: str, dataset: str, scene: str,
                          method_label: str) -> dict:
    """Read back a packed scene (the import side of the helpers)."""
    paths = submission_paths(base, dataset, scene, method_label)

    def _maybe(path):
        for cand in (path, path + ".npz"):
            if os.path.exists(cand):
                return load_h5(cand)
        return {}

    out = {
        "keypoints": _maybe(paths["keypoints"]),
        "scores": _maybe(paths["scores"]),
        "descriptors": _maybe(paths["descriptors"]),
        "matches": _maybe(paths["matches"]),
    }
    if os.path.isdir(paths["model"]):
        from vggsfm_tpu.io import read_model

        out["model"] = read_model(paths["model"])
    return out
