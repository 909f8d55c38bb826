"""Bundle adjustment tests on synthetic multi-view scenes."""

import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.ba import BAConfig, bundle_adjust, reprojection_cost


def make_bundle(rng, S=6, N=400, noise_px=0.0, width=640, height=480):
    f = float(max(width, height))
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(N, 3))

    extrinsics = np.zeros((S, 3, 4))
    intrinsics = np.zeros((S, 3, 3))
    tracks = np.zeros((S, N, 2))
    for s in range(S):
        angle = 0.12 * (s - S / 2)
        R = np.array([
            [np.cos(angle), 0, np.sin(angle)],
            [0, 1, 0],
            [-np.sin(angle), 0, np.cos(angle)],
        ])
        t = np.array([0.4 * (s - S / 2), 0.02 * s, 0.1 * s])
        K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
        extrinsics[s] = np.concatenate([R, t[:, None]], axis=1)
        intrinsics[s] = K
        Xc = (R @ X.T).T + t
        uv = (K @ Xc.T).T
        tracks[s] = uv[:, :2] / uv[:, 2:]
    if noise_px:
        tracks += rng.normal(scale=noise_px, size=tracks.shape)
    mask = np.ones((S, N), bool)
    return extrinsics, intrinsics, X, tracks, mask


class TestBundleAdjust:
    def test_recovers_perturbed_bundle(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng)
        S, N = mask.shape
        # perturb everything except the gauge (frame 0 stays at GT)
        extr_n = extr.copy()
        extr_n[1:, :, 3] += rng.normal(scale=0.02, size=(S - 1, 3))
        X_n = X + rng.normal(scale=0.05, size=X.shape)

        cfg = BAConfig(max_iterations=20, refine_focal=False)
        extr_o, intr_o, _, X_o, info = bundle_adjust(
            jnp.asarray(extr_n), jnp.asarray(intr), jnp.asarray(X_n),
            jnp.asarray(tracks), jnp.asarray(mask), cfg=cfg)

        assert float(info["final_cost"]) < 1e-4 * float(info["initial_cost"])
        np.testing.assert_allclose(np.asarray(extr_o[0]), extr[0], atol=1e-6)
        # poses recovered (same gauge since frame 0 + points anchor scale)
        np.testing.assert_allclose(np.asarray(extr_o[1:, :, 3]),
                                   extr[1:, :, 3], atol=5e-3)

    def test_noisy_bundle_reduces_cost(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, noise_px=0.5)
        extr_n = extr.copy()
        extr_n[1:, :, 3] += rng.normal(scale=0.05, size=(mask.shape[0] - 1, 3))
        X_n = X + rng.normal(scale=0.1, size=X.shape)
        cfg = BAConfig(max_iterations=20, refine_focal=False)
        _, _, _, _, info = bundle_adjust(
            jnp.asarray(extr_n), jnp.asarray(intr), jnp.asarray(X_n),
            jnp.asarray(tracks), jnp.asarray(mask), cfg=cfg)
        # converges to the noise floor, far below the perturbed start
        assert float(info["final_cost"]) < 0.05 * float(info["initial_cost"])

    def test_refines_focal(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng)
        intr_n = intr.copy()
        intr_n[:, 0, 0] *= 1.05
        intr_n[:, 1, 1] *= 1.05
        cfg = BAConfig(max_iterations=25, refine_focal=True)
        _, intr_o, _, _, info = bundle_adjust(
            jnp.asarray(extr), jnp.asarray(intr_n), jnp.asarray(X),
            jnp.asarray(tracks), jnp.asarray(mask), cfg=cfg)
        got_f = np.asarray(intr_o[:, 0, 0])
        np.testing.assert_allclose(got_f, intr[:, 0, 0], rtol=5e-3)

    def test_frozen_points_stay(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, N=100)
        X_n = X + rng.normal(scale=0.05, size=X.shape)
        point_free = np.ones(100, bool)
        point_free[:10] = False
        cfg = BAConfig(max_iterations=5, refine_focal=False)
        _, _, _, X_o, _ = bundle_adjust(
            jnp.asarray(extr), jnp.asarray(intr), jnp.asarray(X_n),
            jnp.asarray(tracks), jnp.asarray(mask),
            point_free=jnp.asarray(point_free), cfg=cfg)
        np.testing.assert_allclose(np.asarray(X_o[:10]), X_n[:10], atol=1e-7)
        assert not np.allclose(np.asarray(X_o[10:]), X_n[10:], atol=1e-5)

    def test_frozen_poses_stay(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, N=100)
        extr_n = extr.copy()
        extr_n[:, :, 3] += rng.normal(scale=0.01, size=(mask.shape[0], 3))
        pose_free = np.zeros(mask.shape[0], bool)  # all frozen
        cfg = BAConfig(max_iterations=3, refine_focal=False)
        extr_o, _, _, _, _ = bundle_adjust(
            jnp.asarray(extr_n), jnp.asarray(intr), jnp.asarray(X),
            jnp.asarray(tracks), jnp.asarray(mask),
            pose_free=jnp.asarray(pose_free), cfg=cfg)
        np.testing.assert_allclose(np.asarray(extr_o), extr_n, atol=1e-7)

    def test_shared_intrinsics_tied(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, N=200)
        intr_n = intr.copy()
        intr_n[:, 0, 0] *= 1.04
        intr_n[:, 1, 1] *= 1.04
        cfg = BAConfig(max_iterations=20, shared_intrinsics=True)
        _, intr_o, _, _, _ = bundle_adjust(
            jnp.asarray(extr), jnp.asarray(intr_n), jnp.asarray(X),
            jnp.asarray(tracks), jnp.asarray(mask), cfg=cfg)
        f = np.asarray(intr_o[:, 0, 0])
        np.testing.assert_allclose(f, f[0], rtol=1e-6)  # tied
        np.testing.assert_allclose(f, intr[:, 0, 0], rtol=5e-3)  # recovered

    def test_chunked_matches_unchunked(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, N=300)
        X_n = X + rng.normal(scale=0.03, size=X.shape)
        args = (jnp.asarray(extr), jnp.asarray(intr), jnp.asarray(X_n),
                jnp.asarray(tracks), jnp.asarray(mask))
        a = bundle_adjust(*args, cfg=BAConfig(max_iterations=5,
                                              point_chunk=300))
        b = bundle_adjust(*args, cfg=BAConfig(max_iterations=5,
                                              point_chunk=128))
        np.testing.assert_allclose(np.asarray(a[3]), np.asarray(b[3]),
                                   atol=1e-4)

    def test_robust_loss_downweights_outliers(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, N=300, noise_px=0.2)
        # corrupt 10% of observations in one frame
        tracks = tracks.copy()
        tracks[2, :30] += 80.0
        X_n = X + rng.normal(scale=0.05, size=X.shape)
        extr_in = extr.copy()
        extr_in[1:, :, 3] += rng.normal(scale=0.02, size=(mask.shape[0] - 1, 3))

        cfg = BAConfig(max_iterations=25, refine_focal=False,
                       robust_loss="cauchy", loss_scale=2.0)
        extr_o, _, _, _, _ = bundle_adjust(
            jnp.asarray(extr_in), jnp.asarray(intr), jnp.asarray(X_n),
            jnp.asarray(tracks), jnp.asarray(mask), cfg=cfg)
        np.testing.assert_allclose(np.asarray(extr_o[1:, :, 3]),
                                   extr[1:, :, 3], atol=2e-2)


class TestCost:
    def test_zero_at_ground_truth(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, N=50)
        c = reprojection_cost(
            jnp.asarray(extr), jnp.asarray(intr[:, 0, 0]),
            jnp.asarray(intr[:, :2, 2]), None, jnp.asarray(X),
            jnp.asarray(tracks), jnp.asarray(mask, jnp.float32))
        assert float(c) < 1e-4

    def test_behind_camera_costs_more_than_truth(self, rng):
        """Flipping a camera so points go behind it must RAISE the cost.

        Regression: the cost once zeroed behind-camera residuals, so LM
        could reach a 'perfect' zero cost by flipping a camera until every
        observation was behind it (82331a7).
        """
        extr, intr, X, tracks, mask = make_bundle(rng, N=50)
        flipped = extr.copy()
        # rotate camera 1 by 180 deg about x: z axis inverts, all points
        # (z in [6, 10] ahead) land behind the camera
        F = np.diag([1.0, -1.0, -1.0])
        flipped[1, :, :3] = F @ flipped[1, :, :3]
        flipped[1, :, 3] = F @ flipped[1, :, 3]

        def cost(e):
            return float(reprojection_cost(
                jnp.asarray(e), jnp.asarray(intr[:, 0, 0]),
                jnp.asarray(intr[:, :2, 2]), None, jnp.asarray(X),
                jnp.asarray(tracks), jnp.asarray(mask, jnp.float32)))

        assert cost(flipped) > cost(extr) + 1.0
        # also under the robust losses the LM stages use
        for loss in ("huber", "cauchy"):
            cfg = BAConfig(robust_loss=loss, loss_scale=3.0)
            c_true = float(reprojection_cost(
                jnp.asarray(extr), jnp.asarray(intr[:, 0, 0]),
                jnp.asarray(intr[:, :2, 2]), None, jnp.asarray(X),
                jnp.asarray(tracks), jnp.asarray(mask, jnp.float32),
                cfg=cfg))
            c_flip = float(reprojection_cost(
                jnp.asarray(flipped), jnp.asarray(intr[:, 0, 0]),
                jnp.asarray(intr[:, :2, 2]), None, jnp.asarray(X),
                jnp.asarray(tracks), jnp.asarray(mask, jnp.float32),
                cfg=cfg))
            assert c_flip > c_true + 1.0
