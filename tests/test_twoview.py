"""Two-view estimator tests on synthetic scenes with known geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.ops.polynomial import solve_cubic
from vggsfm_tpu.ops.svd3 import project_rank2, svd3x3
from vggsfm_tpu.twoview import (
    decompose_essential_matrix,
    essential_from_fundamental,
    estimate_fundamental,
    estimate_preliminary_cameras,
    normalize_points_masked,
    remove_cheirality,
    run_7point,
    run_8point,
    sampson_epipolar_distance,
)


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def make_two_view_scene(rng, n=200, noise=0.0, outlier_frac=0.0,
                        width=640, height=480):
    """Synthetic pinhole pair with known F; returns pixel correspondences."""
    f = max(width, height)
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
    R = random_rotation(rng * 0 + np.random.default_rng(7)) if False else None
    # modest rotation + baseline so points stay in front of both cameras
    angle = 0.15
    R = np.array([
        [np.cos(angle), 0, np.sin(angle)],
        [0, 1, 0],
        [-np.sin(angle), 0, np.cos(angle)],
    ])
    t = np.array([0.5, 0.05, 0.02])

    X = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    x1 = (K @ X.T).T
    x1 = x1[:, :2] / x1[:, 2:]
    Xc2 = (R @ X.T).T + t
    x2 = (K @ Xc2.T).T
    x2 = x2[:, :2] / x2[:, 2:]

    if noise:
        x1 += rng.normal(scale=noise, size=x1.shape)
        x2 += rng.normal(scale=noise, size=x2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        x2[:n_out] = rng.uniform([0, 0], [width, height], size=(n_out, 2))

    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    F /= np.linalg.norm(F)
    return x1, x2, F, E, R, t, K, n_out


class TestCubic:
    def test_three_real_roots(self):
        # (x-1)(x-2)(x-3) = x^3 - 6x^2 + 11x - 6
        roots, valid = solve_cubic(jnp.array([[1.0, -6.0, 11.0, -6.0]]))
        got = np.sort(np.asarray(roots[0])[np.asarray(valid[0])])
        np.testing.assert_allclose(got, [1, 2, 3], atol=1e-4)

    def test_one_real_root(self):
        # x^3 + x + 10 has single real root -2
        roots, valid = solve_cubic(jnp.array([[1.0, 0.0, 1.0, 10.0]]))
        assert int(valid[0].sum()) == 1
        got = np.asarray(roots[0])[np.asarray(valid[0])]
        np.testing.assert_allclose(got, [-2.0], atol=1e-4)

    def test_quadratic_fallback(self):
        roots, valid = solve_cubic(jnp.array([[0.0, 1.0, -3.0, 2.0]]))
        got = np.sort(np.asarray(roots[0])[np.asarray(valid[0])])
        np.testing.assert_allclose(got, [1, 2], atol=1e-5)

    def test_random_batch_roots_are_roots(self, rng):
        coeffs = rng.normal(size=(256, 4))
        roots, valid = solve_cubic(jnp.asarray(coeffs))
        r = np.asarray(roots)
        v = np.asarray(valid)
        val = (coeffs[:, :1] * r**3 + coeffs[:, 1:2] * r**2
               + coeffs[:, 2:3] * r + coeffs[:, 3:])
        scale = np.abs(coeffs).sum(axis=1, keepdims=True) * \
            np.maximum(np.abs(r), 1.0) ** 3
        assert np.all(np.abs(val[v] / scale[v]) < 1e-3)


class TestSVD3:
    def test_reconstruction(self, rng):
        A = jnp.asarray(rng.normal(size=(512, 3, 3)).astype(np.float32))
        U, S, V = svd3x3(A)
        rec = jnp.einsum("bij,bj,bkj->bik", U, S, V)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(A), atol=2e-4)
        # proper rotations
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(U)), 1.0,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(V)), 1.0,
                                   atol=1e-4)

    def test_singular_values_match_numpy(self, rng):
        A = rng.normal(size=(64, 3, 3)).astype(np.float32)
        _, S, _ = svd3x3(jnp.asarray(A))
        s_np = np.linalg.svd(A, compute_uv=False)
        np.testing.assert_allclose(np.abs(np.asarray(S)), s_np, atol=2e-4,
                                   rtol=1e-3)

    def test_rank2_projection(self, rng):
        A = rng.normal(size=(32, 3, 3)).astype(np.float32)
        P = np.asarray(project_rank2(jnp.asarray(A)))
        s = np.linalg.svd(P, compute_uv=False)
        assert np.all(s[:, 2] < 1e-4)
        # it is the *nearest* rank-2 matrix: distance equals sigma_3
        s_full = np.linalg.svd(A, compute_uv=False)
        np.testing.assert_allclose(np.linalg.norm(P - A, axis=(1, 2)),
                                   s_full[:, 2], atol=1e-4)


def epipolar_error(F, x1, x2):
    p1 = np.concatenate([x1, np.ones_like(x1[:, :1])], axis=1)
    p2 = np.concatenate([x2, np.ones_like(x2[:, :1])], axis=1)
    return np.abs(np.einsum("ni,ij,nj->n", p2, F, p1))


class TestSolvers:
    def test_normalize_points_masked(self, rng):
        pts = rng.normal(size=(2, 100, 2)) * 50 + 200
        mask = rng.uniform(size=(2, 100)) > 0.3
        pn, T = normalize_points_masked(jnp.asarray(pts), jnp.asarray(mask))
        pn, T = np.asarray(pn), np.asarray(T)
        for b in range(2):
            sel = pn[b][mask[b]]
            np.testing.assert_allclose(sel.mean(axis=0), 0.0, atol=1e-5)
            np.testing.assert_allclose(
                np.linalg.norm(sel, axis=1).mean(), np.sqrt(2), atol=1e-4)
            # transform consistency
            ph = np.concatenate([pts[b], np.ones((100, 1))], axis=1)
            np.testing.assert_allclose((T[b] @ ph.T).T[:, :2], pn[b],
                                       atol=1e-4)

    def test_run_8point_exact(self, rng):
        x1, x2, F_gt, *_ = make_two_view_scene(rng, n=100)
        F = np.asarray(run_8point(jnp.asarray(x1)[None], jnp.asarray(x2)[None]))[0]
        err = epipolar_error(F, x1, x2)
        assert err.max() < 1e-3

    def test_run_7point_contains_solution(self, rng):
        x1, x2, F_gt, *_ = make_two_view_scene(rng, n=7)
        F, valid = run_7point(jnp.asarray(x1)[None], jnp.asarray(x2)[None])
        F, valid = np.asarray(F)[0], np.asarray(valid)[0]
        errs = [epipolar_error(F[k] / np.linalg.norm(F[k]), x1, x2).max()
                for k in range(3) if valid[k]]
        assert len(errs) >= 1 and min(errs) < 1e-2

    def test_sampson_zero_for_perfect(self, rng):
        x1, x2, F_gt, *_ = make_two_view_scene(rng, n=50)
        d = sampson_epipolar_distance(
            jnp.asarray(x1)[None], jnp.asarray(x2)[None],
            jnp.asarray(F_gt)[None, None])
        assert float(jnp.max(d)) < 1e-4


class TestLoransac:
    def test_estimate_fundamental_with_outliers(self, rng):
        x1, x2, F_gt, _, _, _, _, n_out = make_two_view_scene(
            rng, n=300, noise=0.3, outlier_frac=0.3)
        out = estimate_fundamental(
            jnp.asarray(x1, jnp.float32)[None],
            jnp.asarray(x2, jnp.float32)[None],
            jax.random.PRNGKey(0),
            max_ransac_iters=512, lo_num=64, max_error=1.0)
        mask = np.asarray(out["inlier_mask"][0])
        inl = int(out["inlier_num"][0])
        # nearly all true inliers found, nearly no outliers admitted
        assert inl > 0.85 * (300 - n_out)
        assert mask[:n_out].sum() < 0.1 * n_out
        F = np.asarray(out["fmat"][0])
        err = epipolar_error(F, x1[n_out:], x2[n_out:])
        assert np.median(err) < 0.5


class TestEssential:
    def test_decompose_recovers_pose(self, rng):
        x1, x2, F_gt, E, R_gt, t_gt, K, _ = make_two_view_scene(rng, n=100)
        Kj = jnp.asarray(K, jnp.float32)[None]
        Em = essential_from_fundamental(jnp.asarray(F_gt, jnp.float32)[None],
                                        Kj, Kj)
        Rs, ts = decompose_essential_matrix(Em)
        fl = jnp.asarray([[K[0, 0], K[1, 1], K[0, 0], K[1, 1]]], jnp.float32)
        pp = jnp.asarray([[K[0, 2], K[1, 2], K[0, 2], K[1, 2]]], jnp.float32)
        R, t = remove_cheirality(Rs, ts, jnp.asarray(x1, jnp.float32)[None],
                                 jnp.asarray(x2, jnp.float32)[None], fl, pp)
        R, t = np.asarray(R)[0], np.asarray(t)[0]
        np.testing.assert_allclose(R, R_gt, atol=1e-2)
        t_dir = t / np.linalg.norm(t)
        t_gt_dir = t_gt / np.linalg.norm(t_gt)
        assert abs(float(t_dir @ t_gt_dir)) > 0.999


class TestPreliminary:
    def test_pipeline_recovers_relative_pose(self, rng):
        width, height = 640, 480
        S, N = 3, 256
        tracks = np.zeros((1, S, N, 2), np.float32)
        vis = np.ones((1, S, N), np.float32)
        R_gts, t_gts = [], []
        x1 = None
        for s in range(S):
            r = np.random.default_rng(100 + s)
            if s == 0:
                x1, x2, _, _, R, t, K, _ = make_two_view_scene(
                    r, n=N, noise=0.2, width=width, height=height)
                tracks[0, 0] = x1
                tracks[0, 1] = x2
            else:
                # second reference view: same scene, different pose — rebuild
                x1b, x2, _, _, R, t, K, _ = make_two_view_scene(
                    r, n=N, noise=0.2, width=width, height=height)
                tracks[0, s] = x2 if s > 1 else tracks[0, s]
            if s >= 1:
                R_gts.append(R)
                t_gts.append(t)
        # frame 2 built from a different x1 sample — recreate consistently:
        # regenerate scene 2 reprojected from frame-0 points is complex; use
        # pair (0,1) only for the pose assertion below.
        out = estimate_preliminary_cameras(
            jnp.asarray(tracks), jnp.asarray(vis), width, height,
            jax.random.PRNGKey(1), max_ransac_iters=512, lo_num=64)
        extr = np.asarray(out["extrinsics"])[0]
        np.testing.assert_allclose(extr[0], np.eye(3, 4), atol=1e-6)
        R01 = extr[1, :, :3]
        t01 = extr[1, :, 3]
        rot_err = np.degrees(np.arccos(np.clip(
            (np.trace(R01.T @ R_gts[0]) - 1) / 2, -1, 1)))
        assert rot_err < 2.0
        t_dir = t01 / np.linalg.norm(t01)
        t_gt = t_gts[0] / np.linalg.norm(t_gts[0])
        assert abs(float(t_dir @ t_gt)) > 0.99
