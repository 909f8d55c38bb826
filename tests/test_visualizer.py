"""Track / reprojection visualization tests."""

import os

import numpy as np

from vggsfm_tpu.utils.visualizer import (
    draw_points,
    visualize_reprojections,
    visualize_tracks,
)


class TestVisualizer:
    def test_draw_points_stamps_colors(self):
        img = np.zeros((32, 32, 3), np.uint8)
        out = draw_points(img, np.array([[10.0, 5.0]]),
                          np.array([[255, 0, 0]], np.uint8), radius=1)
        assert (out[5, 10] == [255, 0, 0]).all()
        assert (img == 0).all()  # original untouched

    def test_visualize_tracks_writes_frames_and_gif(self, tmp_path, rng):
        S, H, W, N = 3, 48, 48, 10
        images = rng.uniform(size=(S, H, W, 3)).astype(np.float32)
        tracks = rng.uniform(5, 43, size=(S, N, 2)).astype(np.float32)
        vis = np.ones((S, N), np.float32)
        paths = visualize_tracks(images, tracks, vis, str(tmp_path))
        # pngs + gif, and an mp4 when a cv2 codec is available
        assert len(paths) in (S + 1, S + 2)
        if len(paths) == S + 2:
            assert paths[-1].endswith((".mp4", ".avi"))
            assert os.path.getsize(paths[-1]) > 0
        assert all(os.path.exists(p) for p in paths)

    def test_visualize_reprojections(self, tmp_path, rng):
        S, N = 2, 8
        images = rng.uniform(size=(S, 48, 48, 3)).astype(np.float32)
        tracks = rng.uniform(5, 43, size=(S, N, 2)).astype(np.float32)
        pts = rng.uniform(-1, 1, size=(N, 3))
        extr = np.tile(np.eye(3, 4), (S, 1, 1))
        K = np.tile(np.array([[40.0, 0, 24], [0, 40, 24], [0, 0, 1]]),
                    (S, 1, 1))
        paths = visualize_reprojections(images, tracks, pts, extr, K,
                                        np.ones(N, bool), str(tmp_path))
        assert len(paths) in (S, S + 1)  # + reproj video if codec
        if len(paths) == S + 1:
            assert paths[-1].endswith((".mp4", ".avi"))
