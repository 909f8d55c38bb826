"""Unit tests for the multi-host map merge (parallel/merge.py)."""

import numpy as np
import pytest

from vggsfm_tpu.parallel.merge import (
    frame_block,
    fuse_duplicate_points,
    merge_partial_maps,
    save_partial,
    wait_for_partials,
)
from vggsfm_tpu.video.runner import MapRegistry


class TestFrameBlock:
    def test_blocks_partition_contiguously(self):
        T, S0 = 30, 4
        blocks = [frame_block(T, S0, 3, h) for h in range(3)]
        covered = []
        for b0, b1 in blocks:
            covered.extend(range(b0, b1))
        assert covered == list(range(S0, T))

    def test_single_host_owns_everything(self):
        assert frame_block(20, 4, 1, 0) == (4, 20)

    def test_short_sequence(self):
        # fewer remaining frames than hosts: trailing hosts get empty
        blocks = [frame_block(5, 4, 4, h) for h in range(4)]
        assert blocks[0] == (4, 5)
        assert all(b0 >= b1 for b0, b1 in blocks[1:])


def _partial(host, T, P0, new_pts, block, obs, extr_val):
    """Build a partial dict the merge consumes."""
    reg = MapRegistry()
    reg.add_points(np.arange(P0 * 3, dtype=np.float32).reshape(P0, 3))
    reg.add_points(new_pts)
    of, op, oxy = obs
    reg.add_observations(of, op, oxy)
    extr = np.zeros((T, 3, 4), np.float32)
    registered = np.zeros((T,), bool)
    registered[:block[0] if host == 0 else 0] = host == 0
    registered[block[0]:block[1]] = True
    if host == 0:
        registered[:4] = True
    extr[registered] = extr_val
    intr = np.tile(np.eye(3, dtype=np.float32), (T, 1, 1))
    return {
        "xyz": reg.xyz, "obs_frame": reg.obs_frame,
        "obs_point": reg.obs_point, "obs_xy": reg.obs_xy,
        "extrinsics": extr, "intrinsics": intr,
        "extra": np.zeros((0,)), "registered": registered,
        "shared_points": np.int64(P0),
        "block": np.asarray(block, np.int64),
    }


class TestMergePartials:
    def test_ids_offset_and_frames_union(self):
        T, P0 = 12, 5
        # host 0: block [4, 8), 2 new points, observes shared pt 0 @f4,
        # its new pt 5 @f5, plus an init-window obs @f0
        p0 = _partial(
            0, T, P0, np.ones((2, 3), np.float32), (4, 8),
            (np.array([0, 4, 5]), np.array([1, 0, P0]),
             np.zeros((3, 2), np.float32)), 1.0)
        # host 1: block [8, 12), 3 new points, observes shared pt 2 @f8,
        # its new pt 5 (local id) @f9, and carries a DUPLICATE init obs
        # @f1 that must be dropped by the merge
        p1 = _partial(
            1, T, P0, np.full((3, 3), 7.0, np.float32), (8, 12),
            (np.array([1, 8, 9]), np.array([1, 2, P0]),
             np.ones((3, 2), np.float32)), 2.0)
        reg, extr, intr, extra, registered = merge_partial_maps(
            [p0, p1], MapRegistry)

        assert reg.num_points == P0 + 2 + 3
        assert registered.all() or registered[:12].sum() == 12
        # host 1's new point P0(local) -> P0+2 (after host 0's 2)
        assert set(reg.obs_point.tolist()) == {1, 0, P0, 2, P0 + 2}
        # host 1's duplicate init-window observation (@f1) dropped
        assert (reg.obs_frame == 1).sum() == 0
        # host 1's block poses taken from host 1's partial
        np.testing.assert_allclose(extr[8], 2.0)
        np.testing.assert_allclose(extr[4], 1.0)

    def test_save_wait_roundtrip(self, tmp_path):
        T, P0 = 8, 3
        reg = MapRegistry()
        reg.add_points(np.zeros((P0, 3), np.float32))
        extr = np.zeros((T, 3, 4), np.float32)
        intr = np.zeros((T, 3, 3), np.float32)
        registered = np.ones((T,), bool)
        save_partial(str(tmp_path), 0, reg, extr, intr, None,
                     registered, P0, (4, 8))
        parts = wait_for_partials(str(tmp_path), 1, timeout_s=5)
        assert int(parts[0]["shared_points"]) == P0

    def test_wait_times_out(self, tmp_path):
        with pytest.raises(TimeoutError):
            wait_for_partials(str(tmp_path), 2, timeout_s=0.2)


class TestFuseDuplicates:
    def test_coincident_new_points_fuse(self):
        reg = MapRegistry()
        reg.add_points(np.zeros((2, 3), np.float32))  # shared
        reg.add_points(np.array([[1.0, 1.0, 1.0],
                                 [1.001, 1.0, 1.0],   # dup of previous
                                 [5.0, 5.0, 5.0]], np.float32))
        reg.add_observations(np.array([0, 1, 2, 3]),
                             np.array([2, 3, 4, 0]),
                             np.zeros((4, 2), np.float32))
        stats = fuse_duplicate_points(reg, shared_points=2, tol=0.02)
        assert stats["fused"] == 1
        assert reg.num_points == 4
        # both observations of the fused pair hit the same surviving id
        assert reg.obs_point[0] == reg.obs_point[1]
        assert reg.obs_point.max() < reg.num_points

    def test_shared_points_never_fuse(self):
        reg = MapRegistry()
        reg.add_points(np.zeros((3, 3), np.float32))  # 3 coincident shared
        stats = fuse_duplicate_points(reg, shared_points=3, tol=1.0)
        assert stats["fused"] == 0
        assert reg.num_points == 3

    def test_distant_points_untouched(self):
        reg = MapRegistry()
        reg.add_points(np.zeros((1, 3), np.float32))
        reg.add_points(np.array([[1.0, 0, 0], [2.0, 0, 0]], np.float32))
        stats = fuse_duplicate_points(reg, shared_points=1, tol=0.02)
        assert stats["fused"] == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
