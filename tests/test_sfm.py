"""End-to-end SfM solver tests on synthetic scenes (no neural nets)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.geometry.metrics import pose_auc30
from vggsfm_tpu.sfm import SfmConfig, run_sfm
from vggsfm_tpu.sfm.triangulator import find_best_initial_pair


def make_scene(rng, S=6, N=300, noise_px=0.3, outlier_frac=0.1,
               width=640, height=480):
    f = float(max(width, height))
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(N, 3))
    extr = np.zeros((S, 3, 4))
    intr = np.zeros((S, 3, 3))
    tracks = np.zeros((S, N, 2))
    for s in range(S):
        a = 0.12 * (s - S / 2)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]])
        t = np.array([0.5 * (s - S / 2), 0.03 * s, 0.05 * s])
        K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1.0]])
        extr[s] = np.concatenate([R, t[:, None]], axis=1)
        intr[s] = K
        Xc = (R @ X.T).T + t
        uv = (K @ Xc.T).T
        tracks[s] = uv[:, :2] / uv[:, 2:]
    # express relative to frame 0 (pipeline convention: frame 0 ~ identity)
    R0 = extr[0, :, :3].copy()
    t0 = extr[0, :, 3].copy()
    for s in range(S):
        R, t = extr[s, :, :3], extr[s, :, 3]
        extr[s, :, :3] = R @ R0.T
        extr[s, :, 3] = t - extr[s, :, :3] @ t0

    tracks += rng.normal(scale=noise_px, size=tracks.shape)
    n_out = int(outlier_frac * N)
    # corrupt some observations in non-query frames
    for s in range(1, S):
        sel = rng.choice(N, n_out, replace=False)
        tracks[s, sel] += rng.uniform(30, 120, size=(n_out, 2))
    vis = np.ones((S, N), np.float32)
    return extr, intr, X, tracks, vis


class TestFindInitialPair:
    def test_picks_highest_inlier_frame(self, rng):
        S, N = 4, 200
        inlier = np.zeros((S - 1, N), bool)
        inlier[1, :150] = True
        inlier[0, :50] = True
        cheir = np.ones((S - 1, N), bool)
        angles = np.full((S - 1, N), 20.0)
        total, idx = find_best_initial_pair(
            jnp.asarray(inlier), jnp.asarray(cheir), jnp.asarray(angles), 16)
        assert int(idx) == 1
        assert int(total.sum()) == 200

    def test_relaxes_angle_threshold(self, rng):
        S, N = 3, 200
        inlier = np.ones((S - 1, N), bool)
        cheir = np.ones((S - 1, N), bool)
        angles = np.full((S - 1, N), 3.0)  # below 16, above 16/8
        total, idx = find_best_initial_pair(
            jnp.asarray(inlier), jnp.asarray(cheir), jnp.asarray(angles), 16)
        # threshold relaxed until the pair passes
        assert int(total.sum(-1).max()) == N


class TestRunSfm:
    def test_recovers_scene_from_noisy_cameras(self, rng):
        extr, intr, X, tracks, vis = make_scene(rng)
        S = extr.shape[0]
        # perturb initial cameras (as if from a coarse camera predictor)
        extr_n = extr.copy()
        extr_n[1:, :, 3] += rng.normal(scale=0.05, size=(S - 1, 3))

        cfg = SfmConfig(ba_max_iterations=15, max_ransac_iters=128,
                        robust_refine=1, ba_iters=1)
        out = run_sfm(jnp.asarray(extr_n, jnp.float32),
                      jnp.asarray(intr, jnp.float32),
                      jnp.asarray(tracks, jnp.float32),
                      jnp.asarray(vis), (640, 480), cfg=cfg)

        valid = np.asarray(out["valid_tracks"])
        assert valid.sum() > 0.7 * len(valid)
        auc = pose_auc30(jnp.asarray(out["extrinsics"]),
                         jnp.asarray(extr, jnp.float32))
        assert float(auc) > 0.9
        assert np.asarray(out["valid_frame_mask"]).all()

    def test_jitted_run_sfm_matches_eager(self, rng):
        """run_sfm compiles as ONE program (jit_sfm path) and matches the
        eager composition bitwise-closely."""
        import jax

        extr, intr, X, tracks, vis = make_scene(rng, S=4, N=150)
        cfg = SfmConfig(ba_max_iterations=5, max_ransac_iters=64,
                        robust_refine=1, ba_iters=1)
        args = (jnp.asarray(extr, jnp.float32),
                jnp.asarray(intr, jnp.float32),
                jnp.asarray(tracks, jnp.float32), jnp.asarray(vis))
        eager = run_sfm(*args, (640, 480), cfg=cfg)
        from functools import partial

        jitted = jax.jit(partial(run_sfm, image_size=(640, 480),
                                 cfg=cfg))(*args)
        np.testing.assert_allclose(np.asarray(jitted["extrinsics"]),
                                   np.asarray(eager["extrinsics"]),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(jitted["valid_tracks"]),
                                      np.asarray(eager["valid_tracks"]))

    def test_static_shapes_preserved(self, rng):
        extr, intr, X, tracks, vis = make_scene(rng, S=4, N=150)
        cfg = SfmConfig(ba_max_iterations=5, max_ransac_iters=64,
                        robust_refine=0, ba_iters=1)
        out = run_sfm(jnp.asarray(extr, jnp.float32),
                      jnp.asarray(intr, jnp.float32),
                      jnp.asarray(tracks, jnp.float32),
                      jnp.asarray(vis), (640, 480), cfg=cfg)
        assert out["points3d"].shape == (150, 3)
        assert out["valid_2d_mask"].shape == (4, 150)
        assert out["extrinsics"].shape == (4, 3, 4)
