"""COLMAP binary IO round-trip + array bridge tests."""

import numpy as np

from vggsfm_tpu.io import (
    arrays_to_reconstruction,
    read_model,
    reconstruction_to_arrays,
    write_model,
)


def make_batch(rng, S=4, P=50):
    extr = np.zeros((S, 3, 4))
    for s in range(S):
        a = 0.1 * s
        extr[s, :, :3] = np.array([
            [np.cos(a), 0, np.sin(a)],
            [0, 1, 0],
            [-np.sin(a), 0, np.cos(a)],
        ])
        extr[s, :, 3] = [0.1 * s, 0.0, 0.05 * s]
    intr = np.tile(np.array([[500.0, 0, 320], [0, 500.0, 240],
                             [0, 0, 1]]), (S, 1, 1))
    pts = rng.uniform(-1, 1, size=(P, 3))
    tracks = rng.uniform(0, 600, size=(S, P, 2))
    masks = rng.uniform(size=(S, P)) > 0.3
    masks[:, 0] = False  # never-seen point must be dropped
    masks[0, 1] = True
    masks[1:, 1] = False  # single-view point must be dropped
    return extr, intr, pts, tracks, masks


class TestBridge:
    def test_roundtrip_through_reconstruction(self, rng):
        extr, intr, pts, tracks, masks = make_batch(rng)
        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, masks, (640, 480),
            camera_type="SIMPLE_PINHOLE")
        assert 0 not in rec.points3D and 1 not in rec.points3D

        pts_o, extr_o, intr_o, extra_o, mask_o = reconstruction_to_arrays(
            rec, num_points=pts.shape[0])
        valid = masks.sum(0) >= 2
        np.testing.assert_array_equal(mask_o, valid)
        np.testing.assert_allclose(pts_o[valid], pts[valid], atol=1e-9)
        np.testing.assert_allclose(extr_o, extr, atol=1e-7)
        np.testing.assert_allclose(intr_o, intr, atol=1e-7)
        assert extra_o is None

    def test_track_links_consistent(self, rng):
        extr, intr, pts, tracks, masks = make_batch(rng)
        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, masks, (640, 480))
        for pid, pt in rec.points3D.items():
            for im_id, p2d_idx in zip(pt.image_ids, pt.point2D_idxs):
                im = rec.images[im_id]
                assert im.point3D_ids[p2d_idx] == pid
                np.testing.assert_allclose(
                    im.xys[p2d_idx], tracks[im_id - 1, pid], atol=1e-9)

    def test_shared_camera(self, rng):
        extr, intr, pts, tracks, masks = make_batch(rng)
        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, masks, (640, 480), shared_camera=True)
        assert len(rec.cameras) == 1

    def test_radial_model_carries_extra(self, rng):
        extr, intr, pts, tracks, masks = make_batch(rng)
        extra = np.full((4, 1), 0.02)
        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, masks, (640, 480),
            extra_params=extra, camera_type="SIMPLE_RADIAL")
        _, _, _, extra_o, _ = reconstruction_to_arrays(rec)
        np.testing.assert_allclose(extra_o, extra, atol=1e-12)


class TestBinaryIO:
    def test_write_read_roundtrip(self, rng, tmp_path):
        extr, intr, pts, tracks, masks = make_batch(rng)
        colors = rng.integers(0, 255, size=(50, 3)).astype(np.uint8)
        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, masks, (640, 480), colors=colors,
            image_names=[f"img{s}.png" for s in range(4)])
        write_model(rec, str(tmp_path / "sparse"), ext=".bin")
        rec2 = read_model(str(tmp_path / "sparse"))

        assert rec2.cameras.keys() == rec.cameras.keys()
        assert rec2.images.keys() == rec.images.keys()
        assert rec2.points3D.keys() == rec.points3D.keys()
        for im_id in rec.images:
            a, b = rec.images[im_id], rec2.images[im_id]
            assert a.name == b.name
            np.testing.assert_allclose(a.qvec, b.qvec)
            np.testing.assert_allclose(a.tvec, b.tvec)
            np.testing.assert_allclose(a.xys, b.xys)
            np.testing.assert_array_equal(a.point3D_ids, b.point3D_ids)
        for pid in rec.points3D:
            a, b = rec.points3D[pid], rec2.points3D[pid]
            np.testing.assert_allclose(a.xyz, b.xyz)
            np.testing.assert_array_equal(a.rgb, b.rgb)
            np.testing.assert_array_equal(a.image_ids, b.image_ids)

    def test_text_output_parses(self, rng, tmp_path):
        extr, intr, pts, tracks, masks = make_batch(rng)
        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, masks, (640, 480))
        write_model(rec, str(tmp_path / "sparse_txt"), ext=".txt")
        lines = (tmp_path / "sparse_txt" / "cameras.txt").read_text()
        assert "SIMPLE_PINHOLE" in lines
