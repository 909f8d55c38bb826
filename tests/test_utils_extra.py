"""Camera averaging, query ranking, and PLY export tests."""

import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.io.ply import (
    camera_frustum_edges,
    export_scene_ply,
    write_ply_points,
)
from vggsfm_tpu.utils.camera_avg import (
    average_rotations,
    rank_by_dino_similarity,
    rank_by_midpoint,
)


class TestRotationAveraging:
    def test_mean_of_identical_rotations(self, rng):
        from vggsfm_tpu.geometry.rotations import axis_angle_to_matrix
        R = np.asarray(axis_angle_to_matrix(jnp.asarray([0.3, -0.2, 0.1])))
        Rs = jnp.asarray(np.tile(R, (5, 4, 1, 1)))
        avg = np.asarray(average_rotations(Rs))
        np.testing.assert_allclose(avg, np.tile(R, (4, 1, 1)), atol=1e-5)

    def test_sign_flip_robust(self, rng):
        """Quaternions with flipped hemispheres average correctly."""
        from vggsfm_tpu.geometry.rotations import (
            axis_angle_to_matrix, matrix_to_quaternion,
            quaternion_to_matrix)
        R = axis_angle_to_matrix(jnp.asarray([0.2, 0.5, -0.1]))
        q = matrix_to_quaternion(R)
        R_flip = quaternion_to_matrix(-q)  # same rotation, flipped quat
        Rs = jnp.stack([R, R_flip])[:, None]
        avg = np.asarray(average_rotations(Rs))[0]
        np.testing.assert_allclose(avg, np.asarray(R), atol=1e-5)

    def test_small_perturbations_average_out(self, rng):
        from vggsfm_tpu.geometry.rotations import axis_angle_to_matrix
        base = np.array([0.1, 0.2, 0.3])
        Rs = jnp.stack([
            axis_angle_to_matrix(jnp.asarray(base + eps))
            for eps in [[0.01, 0, 0], [-0.01, 0, 0], [0, 0.01, 0],
                        [0, -0.01, 0]]])[:, None]
        avg = np.asarray(average_rotations(Rs))[0]
        want = np.asarray(axis_angle_to_matrix(jnp.asarray(base)))
        np.testing.assert_allclose(avg, want, atol=1e-3)


class TestRanking:
    def test_midpoint(self):
        out = rank_by_midpoint(10, 3)
        assert out[0] == 0
        assert len(out) == 3

    def test_dino_fps_spreads(self, rng):
        # three clusters of similar frames; FPS should cover all clusters
        f = np.zeros((9, 8), np.float32)
        f[0:3, 0] = 1
        f[3:6, 1] = 1
        f[6:9, 2] = 1
        f += rng.normal(scale=0.01, size=f.shape)
        sel = rank_by_dino_similarity(jnp.asarray(f), 3)
        clusters = {i // 3 for i in sel}
        assert len(clusters) == 3
        assert sel[0] == 0 or 0 in sel


class TestPly:
    def test_points_roundtrip_header(self, tmp_path, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        col = (rng.uniform(size=(10, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "cloud.ply")
        write_ply_points(p, pts, col)
        data = open(p, "rb").read()
        assert b"element vertex 10" in data
        assert b"property uchar red" in data

    def test_frustum_edges(self):
        extr = np.eye(3, 4)[None]
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])[None]
        v, e = camera_frustum_edges(extr, K, (640, 480))
        assert v.shape == (5, 3) and e.shape == (8, 2)
        np.testing.assert_allclose(v[0], 0.0)  # center at origin

    def test_export_scene(self, tmp_path, rng):
        pts = rng.normal(size=(20, 3))
        extr = np.tile(np.eye(3, 4), (3, 1, 1))
        K = np.tile(np.array([[500.0, 0, 320], [0, 500, 240],
                              [0, 0, 1]]), (3, 1, 1))
        export_scene_ply(str(tmp_path / "scene"), pts, extr, K, (640, 480))
        assert (tmp_path / "scene_points.ply").exists()
        assert (tmp_path / "scene_cameras.ply").exists()
