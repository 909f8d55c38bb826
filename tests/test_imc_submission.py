"""IMC submission packaging round-trip (datasets/imc_submission.py)."""

import numpy as np
import pytest

from vggsfm_tpu.datasets.imc_submission import (
    features_from_tracks,
    load_scene_submission,
    matches_from_tracks,
    pack_scene_submission,
    pair_key,
    submission_paths,
)


def _fake_predictions(S=4, N=20, rng=None):
    rng = rng or np.random.default_rng(0)
    track = rng.uniform(10, 500, size=(S, N, 2)).astype(np.float32)
    vis = rng.uniform(size=(S, N)) > 0.25
    vis[:, :3] = True  # a few tracks seen everywhere
    extr = np.tile(np.eye(3, 4, dtype=np.float32), (S, 1, 1))
    extr[:, 2, 3] = 1.0 + np.arange(S)
    intr = np.tile(np.array([[512.0, 0, 256], [0, 512, 256], [0, 0, 1]],
                            np.float32), (S, 1, 1))
    return {
        "pred_track": track[None],
        "valid_2d_mask": vis,
        "valid_tracks": np.ones(N, bool),
        "pred_score": rng.uniform(size=(S, N)).astype(np.float32)[None],
        "extrinsics": extr,
        "intrinsics": intr,
        "points3d": rng.normal(size=(N, 3)).astype(np.float32),
        "extra_params": None,
        "colors": rng.uniform(size=(N, 3)).astype(np.float32),
    }


NAMES = ["img_a.png", "img_b.png", "img_c.png", "img_d.png"]


class TestHelpers:
    def test_pair_key_sorted(self):
        assert pair_key("z.png", "a.jpg") == "a-z"

    def test_features_align_with_matches(self):
        preds = _fake_predictions()
        vis = preds["valid_2d_mask"]
        kps, scs = features_from_tracks(NAMES, preds["pred_track"][0], vis)
        matches = matches_from_tracks(NAMES, vis)
        key = pair_key(NAMES[0], NAMES[1])
        m = matches[key]
        # matched keypoint indices must be visible (finite) in both images
        assert np.isfinite(kps["img_a"][m[0]]).all()
        assert np.isfinite(kps["img_b"][m[1]]).all()
        assert (scs["img_a"][m[0]] > 0).all()

    def test_invisible_rows_are_nan(self):
        preds = _fake_predictions()
        vis = preds["valid_2d_mask"].copy()
        vis[0, 5] = False
        kps, scs = features_from_tracks(NAMES, preds["pred_track"][0], vis)
        assert np.isnan(kps["img_a"][5]).all()
        assert scs["img_a"][5] == 0


class TestPackScene:
    def test_pack_and_load_roundtrip(self, tmp_path):
        preds = _fake_predictions()
        paths = pack_scene_submission(
            str(tmp_path), "phototourism", "fountain", "vggsfm_tpu",
            NAMES, preds, image_size=(512, 512))
        assert paths == submission_paths(str(tmp_path), "phototourism",
                                         "fountain", "vggsfm_tpu")
        back = load_scene_submission(str(tmp_path), "phototourism",
                                     "fountain", "vggsfm_tpu")
        assert set(back["keypoints"]) == {"img_a", "img_b", "img_c",
                                          "img_d"}
        assert len(back["matches"]) > 0
        rec = back["model"]
        assert len(rec.images) == 4
        assert len(rec.points3D) > 0
        # keypoint indices in matches stay within the keypoint arrays
        for m in back["matches"].values():
            assert m.max() < back["keypoints"]["img_a"].shape[0]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
