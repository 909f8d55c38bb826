"""IMC dataset harness tests (synthetic fixture, npz calibrations)."""

import os

import numpy as np
import pytest

from vggsfm_tpu.datasets.imc import IMCDataset, evaluate_bag


def make_imc_fixture(tmp_path, n_images=4):
    from PIL import Image

    loc = tmp_path / "grand_place_brussels" / "set_100"
    (loc / "sub_set").mkdir(parents=True)
    (loc / "images").mkdir()
    (loc / "calibration").mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(n_images):
        name = f"img_{i:03d}"
        arr = (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(loc / "images" / f"{name}.jpg")
        a = 0.1 * i
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]])
        T = np.array([0.2 * i, 0.0, 0.1])
        K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]])
        np.savez(loc / "calibration" / f"calibration_{name}.npz",
                 K=K, R=R, T=T)
        names.append(f"images/{name}.jpg")
    with open(loc / "sub_set" / "5bag_000.txt", "w") as f:
        f.write("\n".join(names))
    return str(tmp_path)


class TestIMC:
    def test_loads_bags_and_gt(self, tmp_path):
        root = make_imc_fixture(tmp_path)
        ds = IMCDataset(root, img_size=64, calib_ext=".npz")
        assert ds.sequence_names() == ["5bag_000_grand_place_brussels"]
        bag = ds.load_bag(ds.sequence_names()[0])
        assert bag["images"].shape == (4, 64, 64, 3)
        assert bag["gt_extrinsics"].shape == (4, 3, 4)
        # GT relativized: frame 0 at identity
        np.testing.assert_allclose(bag["gt_extrinsics"][0],
                                   np.eye(3, 4), atol=1e-6)

    def test_evaluate_bag_perfect_prediction(self, tmp_path):
        root = make_imc_fixture(tmp_path)
        ds = IMCDataset(root, img_size=64, calib_ext=".npz")
        bag = ds.load_bag(ds.sequence_names()[0])
        res = evaluate_bag(bag["gt_extrinsics"], bag["gt_extrinsics"])
        assert res["auc30"] > 0.95
        assert np.nanmax(res["rot_err_deg"][res["pair_mask"]]) < 0.1
