"""Crop-param rescale on COLMAP export (original-resolution round trip).

Parity target: runners/runner.py:1009-1052 — intrinsics and points2D must
come back in original image pixel space, with real image names.
"""

import numpy as np

from vggsfm_tpu.datasets.demo_loader import pad_and_resize_image
from vggsfm_tpu.io.bridge import (
    arrays_to_reconstruction,
    rescale_reconstruction_to_original,
)


class TestRescaleExport:
    def _make(self, W, H, img_size=64, S=2):
        rng = np.random.default_rng(0)
        crop_params = []
        for _ in range(S):
            img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
            _, _, par = pad_and_resize_image(img, img_size)
            crop_params.append(par)
        return np.stack(crop_params)

    def test_landscape_roundtrip(self):
        W, H, img_size, S = 120, 80, 64, 2
        crop_params = self._make(W, H, img_size, S)

        # a known original-space correspondence: original pixel (x, y)
        # -> resized-square pixel
        x_orig, y_orig = 90.0, 10.0
        dim = max(W, H)
        left, top = (W - dim) // 2, (H - dim) // 2
        x_res = (x_orig - left) * img_size / dim
        y_res = (y_orig - top) * img_size / dim

        f_res = float(img_size)
        intr = np.tile(np.array([[f_res, 0, img_size / 2],
                                 [0, f_res, img_size / 2],
                                 [0, 0, 1.0]], np.float64), (S, 1, 1))
        extr = np.tile(np.eye(3, 4), (S, 1, 1))
        extr[1, 0, 3] = 0.3
        pts = np.array([[0.0, 0.0, 2.0], [0.2, 0.1, 3.0]])
        tracks = np.full((S, 2, 2), [x_res, y_res])
        masks = np.ones((S, 2), bool)

        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, masks, (img_size, img_size),
            image_names=[f"im{i}.png" for i in range(S)])
        rec = rescale_reconstruction_to_original(
            rec, crop_params, img_size,
            image_names=[f"real_{i}.jpg" for i in range(S)])

        cam = rec.cameras[rec.images[1].camera_id]
        assert cam.width == W and cam.height == H
        # focal scaled by max(W,H)/img_size
        np.testing.assert_allclose(cam.params[0], f_res * dim / img_size)
        np.testing.assert_allclose(cam.params[1:3], [W // 2, H // 2])
        assert rec.images[1].name == "real_0.jpg"

        xy = np.asarray(rec.images[1].xys[0])
        np.testing.assert_allclose(xy, [x_orig, y_orig], atol=1e-6)

    def test_portrait_shared_camera(self):
        W, H, img_size, S = 60, 100, 64, 3
        crop_params = self._make(W, H, img_size, S)
        intr = np.tile(np.array([[64.0, 0, 32], [0, 64, 32], [0, 0, 1.0]]),
                       (S, 1, 1))
        extr = np.tile(np.eye(3, 4), (S, 1, 1))
        pts = np.array([[0.0, 0.0, 2.0]])
        tracks = np.full((S, 1, 2), [30.0, 20.0])
        masks = np.ones((S, 1), bool)
        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, masks, (img_size, img_size),
            shared_camera=True)
        rec = rescale_reconstruction_to_original(rec, crop_params, img_size,
                                                 shared_camera=True)
        assert len(rec.cameras) == 1
        cam = next(iter(rec.cameras.values()))
        assert cam.width == W and cam.height == H
        np.testing.assert_allclose(cam.params[0], 64.0 * H / img_size)
        # points2D still shifted per image
        for im in rec.images.values():
            xy = np.asarray(im.xys[0])
            assert 0 <= xy[0] < W and 0 <= xy[1] < H
