import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.geometry import (
    build_intrinsics,
    se3_inverse,
    camera_centers,
    project_points,
    cam_from_img,
    apply_distortion,
    undistort_points,
    pose_encoding_to_extri_intri,
    extri_intri_to_pose_encoding,
    quaternion_to_matrix,
)
from vggsfm_tpu.geometry.cameras import se3_compose


def random_cameras(rng, B):
    q = rng.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    t = rng.normal(size=(B, 3)) * 0.5
    t[:, 2] += 4.0
    extr = np.concatenate([R, t[..., None]], axis=-1)
    f = rng.uniform(400, 900, size=(B, 2))
    pp = rng.uniform(300, 500, size=(B, 2))
    K = np.asarray(build_intrinsics(jnp.asarray(f), jnp.asarray(pp)))
    return jnp.asarray(extr), jnp.asarray(K)


def test_se3_inverse_roundtrip(rng):
    extr, _ = random_cameras(rng, 16)
    inv = se3_inverse(extr)
    comp = se3_compose(extr, inv)
    eye = jnp.broadcast_to(jnp.eye(3, 4), comp.shape)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(eye), atol=1e-5)


def test_camera_centers(rng):
    extr, _ = random_cameras(rng, 8)
    C = camera_centers(extr)
    # R C + t == 0
    resid = jnp.einsum("bij,bj->bi", extr[:, :, :3], C) + extr[:, :, 3]
    np.testing.assert_allclose(np.asarray(resid), 0.0, atol=1e-5)


def test_project_unproject_consistency(rng):
    extr, K = random_cameras(rng, 4)
    pts = jnp.asarray(rng.normal(size=(50, 3)) * 0.3)
    p2d = project_points(pts, extr, K)
    normalized = cam_from_img(p2d, K)
    # re-derive normalized coords directly
    cam = project_points(pts, extr, K, only_points_cam=True)  # (B,3,P)
    expected = (cam[:, :2] / cam[:, 2:3]).swapaxes(-1, -2)
    np.testing.assert_allclose(
        np.asarray(normalized), np.asarray(expected), atol=1e-4
    )


def test_distortion_roundtrip(rng):
    for K_params in (1, 2, 4):
        params = jnp.asarray(rng.uniform(-0.05, 0.05, size=(6, K_params)))
        pts = jnp.asarray(rng.uniform(-0.6, 0.6, size=(6, 100, 2)))
        u, v = apply_distortion(params, pts[..., 0], pts[..., 1])
        distorted = jnp.stack([u, v], axis=-1)
        recovered = undistort_points(params, distorted)
        np.testing.assert_allclose(
            np.asarray(recovered), np.asarray(pts), atol=1e-5
        )


def test_projection_with_distortion(rng):
    extr, K = random_cameras(rng, 3)
    params = jnp.asarray(rng.uniform(-0.02, 0.02, size=(3, 1)))
    pts = jnp.asarray(rng.normal(size=(20, 3)) * 0.3)
    p2d = project_points(pts, extr, K, extra_params=params)
    normalized = cam_from_img(p2d, K, extra_params=params)
    cam = project_points(pts, extr, K, only_points_cam=True)
    expected = (cam[:, :2] / cam[:, 2:3]).swapaxes(-1, -2)
    np.testing.assert_allclose(
        np.asarray(normalized), np.asarray(expected), atol=1e-4
    )


def test_pose_encoding_roundtrip(rng):
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    T = rng.normal(size=(5, 3))
    fl = rng.uniform(0.5, 3.0, size=(5, 1))
    enc = jnp.asarray(np.concatenate([T, q, fl], axis=-1), dtype=jnp.float32)
    hw = jnp.asarray([768.0, 1024.0])
    extr, intr = pose_encoding_to_extri_intri(enc, hw)
    # first camera is gauge-fixed to identity
    np.testing.assert_allclose(
        np.asarray(extr[0]), np.asarray(jnp.eye(3, 4)), atol=1e-5
    )
    enc2 = extri_intri_to_pose_encoding(extr, intr, hw)
    extr2, intr2 = pose_encoding_to_extri_intri(enc2, hw)
    np.testing.assert_allclose(np.asarray(extr2), np.asarray(extr), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(intr2), np.asarray(intr), rtol=1e-4, atol=1e-2
    )
