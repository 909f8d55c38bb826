"""Native (C++) COLMAP serialization vs the pure-Python writer."""

import numpy as np
import pytest

from vggsfm_tpu.io import native


@pytest.mark.skipif(not native.available(),
                    reason="native library not built (native/build.sh)")
class TestNativeIO:
    def test_observation_block_bytes_match_python(self, rng):
        import struct

        n = 57
        xy = rng.normal(size=(n, 2)).astype(np.float64)
        ids = rng.integers(-1, 1000, size=n).astype(np.int64)
        got = native.pack_observations(xy, ids)

        rec = np.empty((n,), dtype=[("x", "<f8"), ("y", "<f8"),
                                    ("pid", "<i8")])
        rec["x"], rec["y"], rec["pid"] = xy[:, 0], xy[:, 1], ids
        want = struct.pack("<Q", n) + rec.tobytes()
        assert got == want

    def test_points3d_batch_matches_python_writer(self, rng, tmp_path):
        from vggsfm_tpu.io.colmap import (
            Point3D, read_points3D_binary, write_points3D_binary)

        pts = {}
        for pid in range(40):
            ln = int(rng.integers(2, 9))
            pts[pid] = Point3D(
                pid, rng.normal(size=3), rng.integers(0, 255, 3).astype(
                    np.uint8), float(rng.normal()),
                rng.integers(1, 30, ln).astype(np.int32),
                rng.integers(0, 500, ln).astype(np.int32))
        p_native = str(tmp_path / "native.bin")
        write_points3D_binary(pts, p_native)  # native path (available)

        # force the python path by monkeypatching availability
        import vggsfm_tpu.io.native as nat
        orig = nat.available
        nat.available = lambda: False
        try:
            p_py = str(tmp_path / "python.bin")
            write_points3D_binary(pts, p_py)
        finally:
            nat.available = orig

        assert open(p_native, "rb").read() == open(p_py, "rb").read()
        back = read_points3D_binary(p_native)
        assert back.keys() == pts.keys()
        for pid in pts:
            np.testing.assert_allclose(back[pid].xyz, pts[pid].xyz)
            np.testing.assert_array_equal(back[pid].image_ids,
                                          pts[pid].image_ids)
