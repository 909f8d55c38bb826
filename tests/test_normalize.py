"""Gauge normalization + observation-filter hygiene (sfm/normalize.py).

Parity targets: pycolmap `reconstruction.normalize(5.0, 0.1, 0.9, True)`
and `ObservationManager.filter_all_points3D(reproj, tri_angle)` as called
by the reference around joint/global BA (utils/triangulation.py:1212-1218,
runners/video_runner.py:494-541).
"""

import numpy as np
import pytest

from vggsfm_tpu.sfm.normalize import (
    filter_map_observations,
    normalize_reconstruction,
    normalize_similarity,
)


def _random_cams(rng, S, spread=10.0):
    extr = np.zeros((S, 3, 4))
    for s in range(S):
        a = rng.normal(size=3) * 0.3
        th = np.linalg.norm(a)
        k = a / max(th, 1e-9)
        Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                       [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
        c = rng.uniform(-spread, spread, size=3)
        extr[s, :, :3] = R
        extr[s, :, 3] = -R @ c
    return extr


class TestNormalize:
    def test_extent_and_centroid(self, rng=np.random.default_rng(0)):
        """After normalize, the trimmed camera-center bbox diagonal has
        norm `extent` and the trimmed centroid sits at the origin."""
        S = 40
        extr = _random_cams(rng, S)
        pts = rng.normal(size=(100, 3)) * 10
        normalize_reconstruction(extr, pts, extent=5.0)
        scale, centroid = normalize_similarity(extr)
        # re-running finds an already-normalized model
        assert abs(scale - 1.0) < 1e-6
        np.testing.assert_allclose(centroid, 0.0, atol=1e-9)

    def test_geometry_invariant(self, rng=np.random.default_rng(1)):
        """Reprojections are unchanged: normalize is a similarity of the
        world frame, so pixel residuals must be bit-identical math."""
        S, P = 6, 50
        extr = _random_cams(rng, S, spread=2.0)
        # points in front of the cluster
        pts = rng.uniform([-1, -1, 20], [1, 1, 30], size=(P, 3))
        f, c = 100.0, 64.0

        def reproject(extr_, pts_):
            R = extr_[:, :, :3]
            t = extr_[:, :, 3]
            Xc = np.einsum("sij,pj->spi", R, pts_) + t[:, None]
            return f * Xc[..., :2] / Xc[..., 2:] + c

        before = reproject(extr, pts)
        normalize_reconstruction(extr, pts)
        after = reproject(extr, pts)
        np.testing.assert_allclose(before, after, rtol=1e-6, atol=1e-5)

    def test_registered_only(self, rng=np.random.default_rng(2)):
        """Unregistered (zero) camera rows stay zero and don't skew the
        centroid."""
        S = 20
        extr = _random_cams(rng, S)
        registered = np.ones(S, bool)
        registered[5:] = False
        extr[5:] = 0.0
        pts = rng.normal(size=(10, 3))
        normalize_reconstruction(extr, pts, registered=registered)
        np.testing.assert_allclose(extr[5:], 0.0)
        scale, centroid = normalize_similarity(extr, registered)
        assert abs(scale - 1.0) < 1e-6


class _Reg:
    def __init__(self, xyz, of, op, oxy):
        self.xyz = np.asarray(xyz, np.float32)
        self.obs_frame = np.asarray(of, np.int32)
        self.obs_point = np.asarray(op, np.int32)
        self.obs_xy = np.asarray(oxy, np.float32)

    @property
    def num_points(self):
        return len(self.xyz)


class TestFilterObservations:
    def _scene(self, rng, P=30, S=8):
        f, c = 120.0, 64.0
        K = np.array([[f, 0, c], [0, f, c], [0, 0, 1.0]])
        extr = np.zeros((S, 3, 4))
        for s in range(S):
            extr[s, :, :3] = np.eye(3)
            extr[s, :, 3] = [-0.8 * s, 0, 0]  # strong baseline
        pts = rng.uniform([-2, -2, 6], [2, 2, 10], size=(P, 3))
        of, op, oxy = [], [], []
        for p in range(P):
            for s in range(S):
                Xc = extr[s, :, :3] @ pts[p] + extr[s, :, 3]
                uv = K @ Xc
                of.append(s)
                op.append(p)
                oxy.append(uv[:2] / uv[2])
        reg = _Reg(pts, of, op, oxy)
        intr = np.tile(K, (S, 1, 1))
        return reg, extr, intr

    def test_clean_scene_survives(self):
        rng = np.random.default_rng(0)
        reg, extr, intr = self._scene(rng)
        P0, O0 = reg.num_points, len(reg.obs_frame)
        stats = filter_map_observations(reg, extr, intr)
        assert stats == {"dropped_obs": 0, "dropped_points": 0}
        assert reg.num_points == P0 and len(reg.obs_frame) == O0

    def test_outlier_observation_culled(self):
        rng = np.random.default_rng(1)
        reg, extr, intr = self._scene(rng)
        O0 = len(reg.obs_frame)
        reg.obs_xy[3] += 25.0  # one gross outlier observation
        stats = filter_map_observations(reg, extr, intr,
                                        max_reproj_error=2.0)
        assert stats["dropped_obs"] >= 1
        assert len(reg.obs_frame) == O0 - stats["dropped_obs"]

    def test_low_parallax_point_dropped(self):
        rng = np.random.default_rng(2)
        reg, extr, intr = self._scene(rng, P=10)
        # add a point observed only from nearly-identical viewpoints:
        # frames 0 and 1 with a point at depth 1000 -> tiny tri angle
        far = np.array([[0.0, 0.0, 1000.0]], np.float32)
        pid = reg.num_points
        reg.xyz = np.concatenate([reg.xyz, far])
        f, c = 120.0, 64.0
        for s in (0, 1):
            Xc = extr[s, :, :3] @ far[0] + extr[s, :, 3]
            uv = f * Xc[:2] / Xc[2] + c
            reg.obs_frame = np.append(reg.obs_frame,
                                      np.int32(s))
            reg.obs_point = np.append(reg.obs_point, np.int32(pid))
            reg.obs_xy = np.concatenate([reg.obs_xy, uv[None]])
        stats = filter_map_observations(reg, extr, intr,
                                        min_tri_angle=1.5)
        assert stats["dropped_points"] >= 1
        assert reg.num_points == pid  # far point removed, rest compacted
        # observation indices stay consistent after the remap
        assert reg.obs_point.max() < reg.num_points

    def test_track_shorter_than_two_dropped(self):
        rng = np.random.default_rng(3)
        reg, extr, intr = self._scene(rng, P=5)
        # give point 0 exactly one surviving observation by breaking the
        # other seven
        bad = (reg.obs_point == 0) & (reg.obs_frame > 0)
        reg.obs_xy[bad] += 50.0
        stats = filter_map_observations(reg, extr, intr)
        assert stats["dropped_points"] == 1
        assert reg.num_points == 4


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
