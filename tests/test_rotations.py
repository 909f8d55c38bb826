import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.geometry import (
    quaternion_to_matrix,
    matrix_to_quaternion,
    standardize_quaternion,
    quaternion_multiply,
    quaternion_invert,
    axis_angle_to_matrix,
    so3_geodesic_angle,
)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_matrix_roundtrip(rng):
    q = standardize_quaternion(jnp.asarray(random_quats(rng, 256)))
    R = quaternion_to_matrix(q)
    q2 = standardize_quaternion(matrix_to_quaternion(R))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_matrix_is_rotation(rng):
    q = jnp.asarray(random_quats(rng, 128))
    R = quaternion_to_matrix(q)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_matrix_to_quaternion_near_identity():
    # The branch selection must stay stable near the identity and near
    # 180-degree rotations (the hard cases for the naive trace formula).
    for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1)]:
        for angle in [0.0, 1e-4, np.pi - 1e-4, np.pi]:
            aa = jnp.asarray(axis, dtype=jnp.float32) * angle
            R = axis_angle_to_matrix(aa)
            q = matrix_to_quaternion(R)
            R2 = quaternion_to_matrix(q)
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_quaternion_multiply_matches_matrix(rng):
    qa = jnp.asarray(random_quats(rng, 64))
    qb = jnp.asarray(random_quats(rng, 64))
    Rab = quaternion_to_matrix(quaternion_multiply(qa, qb))
    Ra_Rb = quaternion_to_matrix(qa) @ quaternion_to_matrix(qb)
    np.testing.assert_allclose(np.asarray(Rab), np.asarray(Ra_Rb), atol=1e-5)


def test_quaternion_invert(rng):
    q = jnp.asarray(random_quats(rng, 64))
    prod = quaternion_multiply(q, quaternion_invert(q))
    expected = jnp.zeros_like(prod).at[..., 0].set(1.0)
    np.testing.assert_allclose(np.asarray(prod), np.asarray(expected), atol=1e-5)


def test_geodesic_angle(rng):
    angles = rng.uniform(0.1, np.pi - 0.1, size=(32,))
    axes = rng.normal(size=(32, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    R = axis_angle_to_matrix(jnp.asarray(axes * angles[:, None]))
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    got = so3_geodesic_angle(eye, R)
    np.testing.assert_allclose(np.asarray(got), angles, atol=1e-4)


def test_jit_and_vmap():
    q = jnp.asarray([[1.0, 0, 0, 0], [0.5, 0.5, 0.5, 0.5]])
    jit_R = jax.jit(quaternion_to_matrix)(q)
    vmap_R = jax.vmap(quaternion_to_matrix)(q)
    np.testing.assert_allclose(np.asarray(jit_R), np.asarray(vmap_R), atol=1e-6)
