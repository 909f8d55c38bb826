"""Spec-level golden-bytes oracle for the COLMAP binary codec.

The reference validates its IO against pycolmap's C++ implementation
(utils/distortion.py fuzz pattern). pycolmap isn't in this environment, so
the oracle here is the COLMAP binary format specification itself
(scripts/python/read_write_model.py upstream): the fixtures below are
hand-packed with `struct` — byte layouts written independently of
vggsfm_tpu.io.colmap — and the test asserts (a) our reader decodes every
field of the golden bytes exactly, and (b) our writer reproduces the
golden files byte-for-byte. Any convention drift (qvec order, id widths,
name terminator, track layout) fails loudly here.
"""

import struct

import numpy as np

from vggsfm_tpu.io import read_model, write_model


def _golden_cameras() -> bytes:
    # uint64 count | per camera: i32 id, i32 model_id, u64 w, u64 h,
    # f64 params[...]  (SIMPLE_PINHOLE=0: f,cx,cy; SIMPLE_RADIAL=2:
    # f,cx,cy,k)
    b = struct.pack("<Q", 2)
    b += struct.pack("<iiQQ", 1, 0, 640, 480)
    b += struct.pack("<3d", 500.0, 320.0, 240.0)
    b += struct.pack("<iiQQ", 2, 2, 800, 600)
    b += struct.pack("<4d", 650.0, 400.0, 300.0, -0.05)
    return b


def _golden_images() -> bytes:
    # uint64 count | per image: i32 id, f64 qvec[4] (w,x,y,z),
    # f64 tvec[3], i32 camera_id, name\x00, u64 n_pts2d,
    # (f64 x, f64 y, i64 p3d_id)*
    b = struct.pack("<Q", 2)
    q1 = (1.0, 0.0, 0.0, 0.0)
    b += struct.pack("<i", 1) + struct.pack("<4d", *q1)
    b += struct.pack("<3d", 0.1, -0.2, 0.3) + struct.pack("<i", 1)
    b += b"img_a.png\x00"
    b += struct.pack("<Q", 2)
    b += struct.pack("<ddq", 10.5, 20.25, 7)
    b += struct.pack("<ddq", 30.0, 40.0, -1)

    s, c = np.sin(0.1), np.cos(0.1)
    q2 = (float(c), 0.0, float(s), 0.0)
    b += struct.pack("<i", 2) + struct.pack("<4d", *q2)
    b += struct.pack("<3d", -0.5, 0.0, 1.0) + struct.pack("<i", 2)
    b += b"img_b.png\x00"
    b += struct.pack("<Q", 1)
    b += struct.pack("<ddq", 100.0, 200.0, 7)
    return b


def _golden_points() -> bytes:
    # uint64 count | per point: i64 id, f64 xyz[3], u8 rgb[3], f64 error,
    # u64 track_len, (i32 image_id, i32 point2D_idx)*
    b = struct.pack("<Q", 1)
    b += struct.pack("<q", 7) + struct.pack("<3d", 1.0, -2.0, 5.0)
    b += struct.pack("<3B", 10, 200, 30) + struct.pack("<d", 0.75)
    b += struct.pack("<Q", 2)
    b += struct.pack("<ii", 1, 0)
    b += struct.pack("<ii", 2, 0)
    return b


class TestColmapGoldenBytes:
    def _write_golden(self, d):
        (d / "cameras.bin").write_bytes(_golden_cameras())
        (d / "images.bin").write_bytes(_golden_images())
        (d / "points3D.bin").write_bytes(_golden_points())

    def test_reader_decodes_spec_bytes(self, tmp_path):
        self._write_golden(tmp_path)
        rec = read_model(str(tmp_path))

        assert set(rec.cameras) == {1, 2}
        c1, c2 = rec.cameras[1], rec.cameras[2]
        assert c1.model == "SIMPLE_PINHOLE"
        assert (c1.width, c1.height) == (640, 480)
        np.testing.assert_allclose(c1.params, [500.0, 320.0, 240.0])
        assert c2.model == "SIMPLE_RADIAL"
        np.testing.assert_allclose(c2.params,
                                   [650.0, 400.0, 300.0, -0.05])

        im1 = rec.images[1]
        assert im1.name == "img_a.png"
        assert im1.camera_id == 1
        np.testing.assert_allclose(im1.qvec, [1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(im1.tvec, [0.1, -0.2, 0.3])
        np.testing.assert_allclose(im1.xys,
                                   [[10.5, 20.25], [30.0, 40.0]])
        np.testing.assert_array_equal(im1.point3D_ids, [7, -1])

        p = rec.points3D[7]
        np.testing.assert_allclose(p.xyz, [1.0, -2.0, 5.0])
        np.testing.assert_array_equal(p.rgb, [10, 200, 30])
        assert p.error == 0.75
        np.testing.assert_array_equal(p.image_ids, [1, 2])
        np.testing.assert_array_equal(p.point2D_idxs, [0, 0])

    def test_writer_reproduces_spec_bytes(self, tmp_path):
        src = tmp_path / "golden"
        src.mkdir()
        self._write_golden(src)
        rec = read_model(str(src))

        out = tmp_path / "roundtrip"
        out.mkdir()
        write_model(rec, str(out), ext=".bin")
        for name in ("cameras.bin", "images.bin", "points3D.bin"):
            got = (out / name).read_bytes()
            want = (src / name).read_bytes()
            assert got == want, f"{name}: byte drift vs the format spec"
