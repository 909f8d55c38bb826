"""GT camera normalization / crop-scale intrinsics adjustment tests."""

import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.datasets.camera_transform import (
    adjust_intrinsics_to_crop,
    adjust_intrinsics_to_scale,
    first_camera_transform,
    normalize_cameras,
    optical_axis_intersection,
)


def look_at_extrinsics(centers, target):
    """OpenCV world->cam cameras at `centers` whose +z axes hit `target`."""
    out = []
    for c in np.asarray(centers, np.float64):
        z = target - c
        z = z / np.linalg.norm(z)
        up = np.array([0.0, -1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # rows = camera axes in world coords
        t = -R @ c
        out.append(np.concatenate([R, t[:, None]], axis=1))
    return np.stack(out).astype(np.float32)


class TestIntrinsicsAdjust:
    def test_crop_shifts_pp(self):
        K = jnp.asarray([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]])
        K2 = adjust_intrinsics_to_crop(K, jnp.asarray([[100.0, 50, 0, 0]]))
        assert np.allclose(np.asarray(K2[0, :2, 2]), [220, 190])
        assert np.allclose(np.asarray(K2[0, 0, 0]), 500)

    def test_scale_uses_min_ratio(self):
        K = jnp.asarray([[[500.0, 0, 320], [0, 500, 240], [0, 0, 1]]])
        K2 = adjust_intrinsics_to_scale(K, jnp.asarray([640.0, 480.0]),
                                        jnp.asarray([1024.0, 1024.0]))
        s = 1024.0 / 640.0  # min of (1024/640, 1024/480)
        assert np.allclose(np.asarray(K2[0, 0, 0]), 500 * s, rtol=1e-6)
        assert np.allclose(np.asarray(K2[0, :2, 2]), [320 * s, 240 * s],
                           rtol=1e-6)
        assert float(K2[0, 2, 2]) == 1.0

    def test_crop_then_scale_matches_projection(self):
        """A point projected with adjusted K equals transforming the pixel."""
        K = np.array([[500.0, 0, 320], [0, 480, 250], [0, 0, 1]])
        X = np.array([0.3, -0.2, 2.0])
        uv = (K @ X)[:2] / X[2]
        bbox = np.array([80.0, 60.0, 480.0, 360.0])
        Kc = np.asarray(adjust_intrinsics_to_crop(K[None], bbox[None]))[0]
        uv_c = (Kc @ X)[:2] / X[2]
        assert np.allclose(uv_c, uv - bbox[:2], atol=1e-5)
        Ks = np.asarray(adjust_intrinsics_to_scale(
            Kc[None], np.array([480.0, 360.0]), np.array([960.0, 720.0])))[0]
        uv_s = (Ks @ X)[:2] / X[2]
        assert np.allclose(uv_s, uv_c * 2.0, atol=1e-4)


class TestCropParamsAdjust:
    def test_matches_loader_pixel_transform(self):
        """K adjusted via crop_params projects where the loader moves pixels."""
        from vggsfm_tpu.datasets.camera_transform import (
            adjust_intrinsics_from_crop_params,
        )
        from vggsfm_tpu.datasets.demo_loader import crop_parameters

        w, h, img_size = 640, 480, 256
        crop_dim = max(w, h)
        # center square crop/pad to (crop_dim, crop_dim): x offset 0,
        # y offset -(crop_dim - h) / 2 (padding above)
        bbox = np.array([0, -(crop_dim - h) // 2,
                         crop_dim, h - (crop_dim - h) // 2])
        params = crop_parameters(w, h, bbox, crop_dim, img_size)
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]],
                     np.float32)
        K2 = np.asarray(adjust_intrinsics_from_crop_params(
            K, params, img_size))
        X = np.array([0.4, -0.1, 3.0])
        uv = (K @ X)[:2] / X[2]
        uv_expect = (uv - bbox[:2]) * (img_size / crop_dim)
        uv_got = (K2 @ X)[:2] / X[2]
        assert np.allclose(uv_got, uv_expect, atol=1e-3)


class TestNormalizeCameras:
    def test_optical_axis_intersection_exact(self):
        target = np.array([0.5, -0.3, 4.0])
        centers = np.array([[-1.0, 0, 0], [1.0, 0.2, 0], [0, -0.5, 0.5]])
        extr = look_at_extrinsics(centers, target)
        p, dist = optical_axis_intersection(jnp.asarray(extr))
        assert np.allclose(np.asarray(p), target, atol=1e-4)
        assert np.allclose(np.asarray(dist),
                           np.linalg.norm(centers - target, axis=1),
                           atol=1e-4)

    def test_first_camera_transform_identity(self):
        target = np.array([0.0, 0.0, 5.0])
        centers = np.array([[-1.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]])
        extr = look_at_extrinsics(centers, target)
        out, _ = first_camera_transform(jnp.asarray(extr))
        out = np.asarray(out)
        assert np.allclose(out[0, :, :3], np.eye(3), atol=1e-5)
        assert np.allclose(out[0, :, 3], 0.0, atol=1e-5)

    def test_relative_poses_preserved(self):
        """Normalization is a similarity: relative rotations unchanged."""
        target = np.array([0.2, 0.1, 6.0])
        centers = np.array([[-1.5, 0, 0], [0, 0.3, -0.2], [1.2, -0.4, 0.1],
                            [0.5, 0.8, 0.3]])
        extr = look_at_extrinsics(centers, target)
        out, _ = normalize_cameras(jnp.asarray(extr))
        out = np.asarray(out, np.float64)
        e = extr.astype(np.float64)
        for s in range(1, len(centers)):
            R_rel_in = e[s, :, :3] @ e[0, :, :3].T
            R_rel_out = out[s, :, :3] @ out[0, :, :3].T
            assert np.allclose(R_rel_out, R_rel_in, atol=1e-4)

    def test_points_follow_cameras(self):
        """Reprojection is invariant under the normalization."""
        target = np.array([0.0, 0.0, 5.0])
        centers = np.array([[-1.0, 0.1, 0], [1.0, 0, 0.2], [0, -0.6, 0.1]])
        extr = look_at_extrinsics(centers, target)
        rng = np.random.default_rng(0)
        X = target + rng.normal(scale=0.8, size=(50, 3))
        out, Xn = normalize_cameras(jnp.asarray(extr),
                                    points=jnp.asarray(X, jnp.float32))
        out = np.asarray(out, np.float64)
        Xn = np.asarray(Xn, np.float64)
        for s in range(len(centers)):
            Xc_in = (extr[s, :, :3].astype(np.float64) @ X.T).T \
                + extr[s, :, 3]
            Xc_out = (out[s, :, :3] @ Xn.T).T + out[s, :, 3]
            uv_in = Xc_in[:, :2] / Xc_in[:, 2:]
            uv_out = Xc_out[:, :2] / Xc_out[:, 2:]
            assert np.allclose(uv_out, uv_in, atol=1e-3)

    def test_translation_normalized(self):
        target = np.array([0.0, 0.0, 5.0])
        centers = np.array([[-2.0, 0, 0], [2.0, 0, 0], [0, 2.0, 0]])
        extr = look_at_extrinsics(centers, target)
        out, _ = normalize_cameras(jnp.asarray(extr), max_norm=True)
        norms = np.linalg.norm(np.asarray(out)[:, :, 3], axis=-1)
        assert np.isclose(norms.max(), 1.0, atol=1e-5)
