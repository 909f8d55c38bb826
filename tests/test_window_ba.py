"""Unit tests for VideoRunner._window_ba (per-window bundle adjustment).

Parity: reference windowed BA (vggsfm/runners/video_runner.py:800-836 +
solve_bundle_adjustment :1321-1331): frame 0 (query) pose constant, every
pre-existing map point constant, intrinsics constant; the window's new
poses and freshly triangulated points are jointly optimized.
"""

import numpy as np
import pytest

from vggsfm_tpu.video.runner import VideoConfig, VideoRunner


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    Sw, n_map, n_fresh = 4, 40, 30
    f, c = 120.0, 64.0
    K = np.array([[f, 0, c], [0, f, c], [0, 0, 1.0]])
    X_map = rng.uniform([-2, -2, 6], [2, 2, 10],
                        size=(n_map, 3)).astype(np.float32)
    X_fresh = rng.uniform([-2, -2, 6], [2, 2, 10],
                          size=(n_fresh, 3)).astype(np.float32)
    extr_gt = np.zeros((Sw, 3, 4), np.float32)
    for s in range(Sw):
        a = 0.05 * s
        extr_gt[s, :, :3] = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
             [-np.sin(a), 0, np.cos(a)]])
        extr_gt[s, :, 3] = [-0.4 * s, 0.0, 0.0]

    def proj(extr, X):
        Xc = np.einsum("ij,pj->pi", extr[:, :3], X) + extr[:, 3]
        return f * Xc[:, :2] / Xc[:, 2:] + c

    map_tracks = np.stack([proj(extr_gt[s], X_map) for s in range(Sw)])
    fresh_tracks = np.stack([proj(extr_gt[s], X_fresh)
                             for s in range(Sw)])
    return dict(Sw=Sw, K=K, X_map=X_map, X_fresh=X_fresh,
                extr_gt=extr_gt, map_tracks=map_tracks.astype(np.float32),
                fresh_tracks=fresh_tracks.astype(np.float32))


def _run(problem, pose_noise=0.02, point_noise=0.1):
    rng = np.random.default_rng(11)
    Sw = problem["Sw"]
    extr0 = problem["extr_gt"].copy()
    # perturb the NEW poses (1..Sw-1), keep the query exact
    extr0[1:, :, 3] += rng.normal(scale=pose_noise,
                                  size=extr0[1:, :, 3].shape)
    pts0 = problem["X_fresh"] + rng.normal(
        scale=point_noise, size=problem["X_fresh"].shape).astype(
        np.float32)
    runner = VideoRunner.__new__(VideoRunner)
    runner.cfg = VideoConfig()
    n_map = len(problem["X_map"])
    n_fresh = len(pts0)
    extr_o, pts_o = runner._window_ba(
        extr0, np.tile(problem["K"], (Sw, 1, 1)).astype(np.float32),
        None, problem["X_map"], problem["map_tracks"],
        np.ones((Sw, n_map), bool), pts0, problem["fresh_tracks"],
        np.ones((Sw, n_fresh), bool), np.ones((n_fresh,), bool))
    return extr0, pts0, extr_o, pts_o


class TestWindowBA:
    def test_reduces_pose_and_point_error(self, problem):
        extr0, pts0, extr_o, pts_o = _run(problem)
        gt = problem["extr_gt"]
        before_t = np.linalg.norm(extr0[1:, :, 3] - gt[1:, :, 3])
        after_t = np.linalg.norm(extr_o[1:, :, 3] - gt[1:, :, 3])
        assert after_t < 0.2 * before_t, (before_t, after_t)
        before_p = np.linalg.norm(pts0 - problem["X_fresh"])
        after_p = np.linalg.norm(pts_o - problem["X_fresh"])
        assert after_p < 0.2 * before_p, (before_p, after_p)

    def test_query_pose_frozen(self, problem):
        extr0, _, extr_o, _ = _run(problem)
        np.testing.assert_allclose(extr_o[0], extr0[0], atol=1e-7)

    def test_map_points_not_returned_mutated(self, problem):
        """Only the fresh block comes back; the frozen map block is
        dropped by _window_ba — verify the fresh block's size."""
        _, pts0, _, pts_o = _run(problem)
        assert pts_o.shape == pts0.shape

    def test_unkept_fresh_points_stay_put(self, problem):
        """point_free=False lanes (keep mask off) must not move."""
        rng = np.random.default_rng(5)
        Sw = problem["Sw"]
        n_fresh = len(problem["X_fresh"])
        keep = np.ones((n_fresh,), bool)
        keep[:5] = False
        pts0 = problem["X_fresh"] + rng.normal(
            scale=0.1, size=problem["X_fresh"].shape).astype(np.float32)
        runner = VideoRunner.__new__(VideoRunner)
        runner.cfg = VideoConfig()
        n_map = len(problem["X_map"])
        _, pts_o = runner._window_ba(
            problem["extr_gt"].copy(),
            np.tile(problem["K"], (Sw, 1, 1)).astype(np.float32),
            None, problem["X_map"], problem["map_tracks"],
            np.ones((Sw, n_map), bool), pts0, problem["fresh_tracks"],
            np.ones((Sw, n_fresh), bool) & keep[None], keep)
        np.testing.assert_allclose(pts_o[:5], pts0[:5], atol=1e-6)
        # kept lanes moved toward ground truth
        assert (np.linalg.norm(pts_o[5:] - problem["X_fresh"][5:])
                < np.linalg.norm(pts0[5:] - problem["X_fresh"][5:]))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
