import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.geometry import (
    align_camera_extrinsics,
    apply_transformation,
    quaternion_to_matrix,
)
from vggsfm_tpu.geometry.metrics import (
    relative_pose_errors,
    calculate_auc,
    pose_auc30,
)


def random_extrinsics(rng, B):
    q = rng.normal(size=(B, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    t = rng.normal(size=(B, 3))
    return jnp.asarray(np.concatenate([R, t[..., None]], axis=-1))


def test_alignment_recovers_similarity(rng):
    # Property test mirroring the reference's align.py self-test: apply a
    # random similarity to a camera set, recover it, check reconstruction.
    for trial in range(20):
        src = random_extrinsics(rng, 10)
        q = rng.normal(size=(1, 4))
        q /= np.linalg.norm(q)
        R_gt = jnp.asarray(quaternion_to_matrix(jnp.asarray(q))[0])
        T_gt = jnp.asarray(rng.normal(size=(3,)))
        s_gt = jnp.asarray(rng.uniform(0.5, 2.0))
        tgt = apply_transformation(src, R_gt, T_gt, s_gt)
        R, T, s = align_camera_extrinsics(src, tgt)
        aligned = apply_transformation(src, R, T, s)
        np.testing.assert_allclose(
            np.asarray(aligned), np.asarray(tgt), atol=1e-3
        )


def test_identity_alignment(rng):
    src = random_extrinsics(rng, 6)
    R, T, s = align_camera_extrinsics(src, src)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-4)
    np.testing.assert_allclose(np.asarray(T), 0.0, atol=1e-4)
    np.testing.assert_allclose(float(s), 1.0, atol=1e-4)


def test_relative_pose_errors_zero_for_same(rng):
    extr = random_extrinsics(rng, 8)
    r_err, t_err, mask = relative_pose_errors(extr, extr)
    assert np.asarray(r_err)[np.asarray(mask)].max() < 0.2
    auc = pose_auc30(extr, extr)
    assert float(auc) > 0.95


def test_relative_pose_invariant_to_gauge(rng):
    # Relative errors must not change if the prediction lives in a different
    # world frame (similarity-transformed).
    extr = random_extrinsics(rng, 8)
    q = rng.normal(size=(1, 4))
    q /= np.linalg.norm(q)
    R_gt = jnp.asarray(quaternion_to_matrix(jnp.asarray(q))[0])
    moved = apply_transformation(extr, R_gt, jnp.asarray(rng.normal(size=3)), jnp.asarray(1.7))
    r_err, t_err, mask = relative_pose_errors(moved, extr)
    m = np.asarray(mask)
    assert np.asarray(r_err)[m].max() < 0.2
    assert np.asarray(t_err)[m].max() < 0.5


def test_auc_monotonic():
    r = jnp.asarray([0.5, 2.0, 10.0, 40.0])
    t = jnp.asarray([0.5, 1.0, 5.0, 50.0])
    auc_all = calculate_auc(r, t)
    auc_worse = calculate_auc(r + 10.0, t + 10.0)
    assert float(auc_all) > float(auc_worse)
