"""Absolute pose (PnP) tests on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.twoview.pnp import (
    absolute_pose_ransac,
    generate_focal_factors,
    solve_pnp_dlt,
)


def make_pnp_scene(rng, P=200, noise=0.0, outlier_frac=0.0,
                   width=640, height=480):
    f = float(max(width, height))
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    a = 0.3
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]])
    t = np.array([0.4, -0.2, 0.3])
    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(P, 3))
    Xc = (R @ X.T).T + t
    uv = (K @ Xc.T).T
    x = uv[:, :2] / uv[:, 2:]
    if noise:
        x += rng.normal(scale=noise, size=x.shape)
    n_out = int(outlier_frac * P)
    if n_out:
        x[:n_out] = rng.uniform([0, 0], [width, height], size=(n_out, 2))
    return X, x, K, R, t, n_out


class TestFocalFactors:
    def test_matches_colmap_sweep(self):
        fac = generate_focal_factors(50)
        assert len(fac) == 51
        assert fac[-1] == 1.0
        assert abs(fac[0] - 0.2) < 1e-6
        assert fac[:-1].max() < 5.0


class TestSolveDlt:
    def test_exact_recovery(self, rng):
        X, x, K, R, t, _ = make_pnp_scene(rng, P=6)
        xn = (x - K[:2, 2]) / K[0, 0]
        pose = np.asarray(solve_pnp_dlt(
            jnp.asarray(X, jnp.float32)[None],
            jnp.asarray(xn, jnp.float32)[None]))[0]
        # f32 normal-equation nullspace on a MINIMAL set is conditioning-
        # limited (eigengap ~1e-4 relative on this scene): ~1e-2 absolute
        # on t at scene scale ~8 is the f32 floor, not solver error — the
        # parallel-Jacobi eigensolver's nullvector aligns with the f64
        # reference to ~2e-7 (better than the old cyclic order's 3e-5).
        # RANSAC + inlier-set refinement absorb this downstream.
        np.testing.assert_allclose(pose[:, :3], R, atol=5e-3)
        np.testing.assert_allclose(pose[:, 3], t, atol=2e-2)

    def test_masked_overdetermined(self, rng):
        X, x, K, R, t, _ = make_pnp_scene(rng, P=100, noise=0.2)
        xn = (x - K[:2, 2]) / K[0, 0]
        w = np.ones(100, np.float32)
        w[:20] = 0.0
        x_bad = xn.copy()
        x_bad[:20] += 10.0  # corrupted but masked out
        pose = np.asarray(solve_pnp_dlt(
            jnp.asarray(X, jnp.float32)[None],
            jnp.asarray(x_bad, jnp.float32)[None],
            jnp.asarray(w)[None]))[0]
        np.testing.assert_allclose(pose[:, :3], R, atol=5e-3)
        np.testing.assert_allclose(pose[:, 3], t, atol=2e-2)


class TestRansac:
    def test_recovers_pose_with_outliers(self, rng):
        X, x, K, R, t, n_out = make_pnp_scene(rng, P=300, noise=0.3,
                                              outlier_frac=0.25)
        out = absolute_pose_ransac(
            jnp.asarray(X, jnp.float32)[None],
            jnp.asarray(x, jnp.float32)[None],
            jnp.asarray(K, jnp.float32)[None],
            jax.random.PRNGKey(0), max_ransac_iters=256, lo_num=16,
            f_trials=1)
        pose = np.asarray(out["extrinsics"][0])
        np.testing.assert_allclose(pose[:, :3], R, atol=2e-2)
        np.testing.assert_allclose(pose[:, 3], t, atol=6e-2)
        mask = np.asarray(out["inlier_mask"][0])
        assert mask[:n_out].sum() < 0.1 * n_out
        assert int(out["inlier_num"][0]) > 0.8 * (300 - n_out)

    def test_focal_sweep_recovers_wrong_focal(self, rng):
        X, x, K, R, t, _ = make_pnp_scene(rng, P=200, noise=0.2)
        K_wrong = K.copy()
        K_wrong[0, 0] *= 2.0  # focal off by 2x; sweep should fix it
        K_wrong[1, 1] *= 2.0
        out = absolute_pose_ransac(
            jnp.asarray(X, jnp.float32)[None],
            jnp.asarray(x, jnp.float32)[None],
            jnp.asarray(K_wrong, jnp.float32)[None],
            jax.random.PRNGKey(0), max_ransac_iters=256, lo_num=16,
            f_trials=9, max_error=4.0)
        f_best = float(out["intrinsics"][0, 0, 0])
        assert abs(f_best - K[0, 0]) / K[0, 0] < 0.2
        pose = np.asarray(out["extrinsics"][0])
        np.testing.assert_allclose(pose[:, :3], R, atol=0.05)
