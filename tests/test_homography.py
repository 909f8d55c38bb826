"""Homography estimation + decomposition tests on planar scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.twoview.homography import (
    decompose_homography_matrix,
    estimate_homography,
    oneway_transfer_error,
    run_homography_dlt,
)


def make_planar_scene(rng, n=200, noise=0.0, outlier_frac=0.0,
                      width=640, height=480):
    """Points on the plane z = 6 seen by two cameras; returns pixel pairs."""
    f = float(max(width, height))
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    a = 0.2
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]])
    t = np.array([0.6, 0.1, 0.05])
    n_plane = np.array([0.0, 0.0, -1.0])
    d = 6.0

    X = rng.uniform([-2, -2, 0], [2, 2, 0], size=(n, 3))
    X[:, 2] = d
    x1h = (K @ X.T).T
    x1 = x1h[:, :2] / x1h[:, 2:]
    Xc2 = (R @ X.T).T + t
    x2h = (K @ Xc2.T).T
    x2 = x2h[:, :2] / x2h[:, 2:]
    # ground-truth H = K (R - t n^T / d) K^-1   (n pointing away from cam 1)
    H = K @ (R + np.outer(t, -n_plane) / d) @ np.linalg.inv(K)
    H /= np.linalg.norm(H)
    if noise:
        x1 += rng.normal(scale=noise, size=x1.shape)
        x2 += rng.normal(scale=noise, size=x2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        x2[:n_out] = rng.uniform([0, 0], [width, height], size=(n_out, 2))
    return x1, x2, H, K, R, t, n_plane, d, n_out


def transfer_err(H, x1, x2):
    p1 = np.concatenate([x1, np.ones_like(x1[:, :1])], axis=1)
    Hp = (H @ p1.T).T
    return np.linalg.norm(Hp[:, :2] / Hp[:, 2:] - x2, axis=1)


class TestDlt:
    def test_exact(self, rng):
        x1, x2, H_gt, *_ = make_planar_scene(rng, n=50)
        H = np.asarray(run_homography_dlt(
            jnp.asarray(x1, jnp.float32)[None],
            jnp.asarray(x2, jnp.float32)[None]))[0]
        assert transfer_err(H, x1, x2).max() < 0.1


class TestRansac:
    def test_with_outliers(self, rng):
        x1, x2, H_gt, _, _, _, _, _, n_out = make_planar_scene(
            rng, n=300, noise=0.3, outlier_frac=0.3)
        out = estimate_homography(
            jnp.asarray(x1, jnp.float32)[None],
            jnp.asarray(x2, jnp.float32)[None],
            jax.random.PRNGKey(0), max_ransac_iters=512, lo_num=32)
        H = np.asarray(out["hmat"][0])
        err = transfer_err(H, x1[n_out:], x2[n_out:])
        assert np.median(err) < 1.0
        mask = np.asarray(out["inlier_mask"][0])
        assert mask[:n_out].sum() < 0.1 * max(n_out, 1)


class TestDecompose:
    def test_recovers_pose_and_normal(self, rng):
        x1, x2, H_gt, K, R_gt, t_gt, n_gt, d, _ = make_planar_scene(rng)
        Rs, ts, ns = decompose_homography_matrix(
            jnp.asarray(H_gt, jnp.float32)[None],
            jnp.asarray(K, jnp.float32)[None],
            jnp.asarray(K, jnp.float32)[None])
        Rs, ts, ns = np.asarray(Rs)[0], np.asarray(ts)[0], np.asarray(ns)[0]
        t_dir = t_gt / np.linalg.norm(t_gt)
        best = min(range(4), key=lambda i: np.abs(Rs[i] - R_gt).max())
        assert np.abs(Rs[best] - R_gt).max() < 1e-2
        assert abs(float(ts[best] @ t_dir)) > 0.99
