"""Sparse (observation-major, implicit-Schur PCG) BA tests."""

import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.ba import (
    BAConfig,
    SparseBAConfig,
    bundle_adjust,
    bundle_adjust_sparse,
)
from tests.test_ba import make_bundle


def dense_to_obs(tracks, mask):
    """(S,N,2) + (S,N) -> flat obs lists."""
    S, N = mask.shape
    fr, pt = np.nonzero(mask)
    xy = tracks[fr, pt]
    return (fr.astype(np.int32), pt.astype(np.int32),
            xy.astype(np.float32), np.ones(len(fr), np.float32))


class TestSparseBA:
    def test_matches_dense_solver(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, S=5, N=120,
                                                  noise_px=0.3)
        extr_n = extr.copy()
        extr_n[1:, :, 3] += rng.normal(scale=0.03, size=(4, 3))
        X_n = X + rng.normal(scale=0.05, size=X.shape)

        dcfg = BAConfig(max_iterations=10, refine_focal=False)
        scfg = SparseBAConfig(max_iterations=10, refine_focal=False,
                              cg_iters=60)
        d = bundle_adjust(jnp.asarray(extr_n), jnp.asarray(intr),
                          jnp.asarray(X_n), jnp.asarray(tracks),
                          jnp.asarray(mask), cfg=dcfg)
        fr, pt, xy, w = dense_to_obs(tracks, mask)
        s = bundle_adjust_sparse(
            jnp.asarray(extr_n), jnp.asarray(intr), jnp.asarray(X_n),
            jnp.asarray(fr), jnp.asarray(pt), jnp.asarray(xy),
            jnp.asarray(w), cfg=scfg)
        # both reach the same noise floor
        assert float(s[4]["final_cost"]) < 1.1 * float(d[4]["final_cost"]) \
            + 1e-3
        np.testing.assert_allclose(np.asarray(s[0][:, :, 3]),
                                   np.asarray(d[0][:, :, 3]), atol=5e-3)

    def test_padded_observations_are_inert(self, rng):
        extr, intr, X, tracks, mask = make_bundle(rng, S=4, N=60)
        fr, pt, xy, w = dense_to_obs(tracks, mask)
        cfg = SparseBAConfig(max_iterations=5, refine_focal=False)
        base = bundle_adjust_sparse(
            jnp.asarray(extr), jnp.asarray(intr), jnp.asarray(X),
            jnp.asarray(fr), jnp.asarray(pt), jnp.asarray(xy),
            jnp.asarray(w), cfg=cfg)
        # pad with garbage observations at weight 0
        pad = 37
        fr2 = np.concatenate([fr, np.zeros(pad, np.int32)])
        pt2 = np.concatenate([pt, np.zeros(pad, np.int32)])
        xy2 = np.concatenate([xy, 1e4 * np.ones((pad, 2), np.float32)])
        w2 = np.concatenate([w, np.zeros(pad, np.float32)])
        padded = bundle_adjust_sparse(
            jnp.asarray(extr), jnp.asarray(intr), jnp.asarray(X),
            jnp.asarray(fr2), jnp.asarray(pt2), jnp.asarray(xy2),
            jnp.asarray(w2), cfg=cfg)
        np.testing.assert_allclose(np.asarray(padded[3]),
                                   np.asarray(base[3]), atol=1e-6)

    def test_many_frames_converges(self, rng):
        """120-frame strip — the dense reduced system would be 840x840;
        sparse PCG solves it implicitly."""
        S, N = 120, 500
        f = 500.0
        X = rng.uniform([-4, -4, 8], [4, 4, 14], size=(N, 3))
        extr = np.zeros((S, 3, 4))
        intr = np.tile(np.array([[f, 0, 320], [0, f, 240], [0, 0, 1.0]]),
                       (S, 1, 1))
        obs_fr, obs_pt, obs_xy = [], [], []
        for s in range(S):
            a = 0.01 * (s - S / 2)
            R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                          [-np.sin(a), 0, np.cos(a)]])
            t = np.array([0.05 * (s - S / 2), 0, 0.01 * s])
            extr[s] = np.concatenate([R, t[:, None]], axis=1)
            Xc = (R @ X.T).T + t
            uv = (intr[s] @ Xc.T).T
            px = uv[:, :2] / uv[:, 2:]
            # each frame sees a sliding subset of points
            lo = int(s / S * N * 0.5)
            sel = np.arange(lo, min(lo + N // 2, N))
            obs_fr.append(np.full(len(sel), s))
            obs_pt.append(sel)
            obs_xy.append(px[sel])
        fr = np.concatenate(obs_fr).astype(np.int32)
        pt = np.concatenate(obs_pt).astype(np.int32)
        xy = np.concatenate(obs_xy).astype(np.float32)
        xy += rng.normal(scale=0.3, size=xy.shape)
        w = np.ones(len(fr), np.float32)

        extr_n = extr.copy()
        extr_n[1:, :, 3] += rng.normal(scale=0.02, size=(S - 1, 3))
        X_n = X + rng.normal(scale=0.05, size=X.shape)

        cfg = SparseBAConfig(max_iterations=15, refine_focal=False,
                             cg_iters=50)
        out = bundle_adjust_sparse(
            jnp.asarray(extr_n), jnp.asarray(intr), jnp.asarray(X_n),
            jnp.asarray(fr), jnp.asarray(pt), jnp.asarray(xy),
            jnp.asarray(w), cfg=cfg)
        assert float(out[4]["final_cost"]) < 0.02 * \
            float(out[4]["initial_cost"])
        np.testing.assert_allclose(np.asarray(out[0][1:, :, 3]),
                                   extr[1:, :, 3], atol=2e-2)

    def test_shared_intrinsics_tying(self, rng):
        """With shared_intrinsics the focal step is one variable: every
        frame's recovered focal is identical, and a per-frame focal
        perturbation is still corrected toward the true shared value."""
        extr, intr, X, tracks, mask = make_bundle(rng, S=5, N=200,
                                                  noise_px=0.2)
        f_true = intr[0, 0, 0]
        intr_n = intr.copy()
        # mis-scale focals per frame — only a shared-focal solver is
        # allowed to move them in lockstep
        intr_n[:, 0, 0] = intr_n[:, 1, 1] = f_true * 1.05
        X_n = X + rng.normal(scale=0.03, size=X.shape)

        fr, pt, xy, w = dense_to_obs(tracks, mask)
        cfg = SparseBAConfig(max_iterations=12, refine_focal=True,
                             shared_intrinsics=True, cg_iters=60)
        out = bundle_adjust_sparse(
            jnp.asarray(extr), jnp.asarray(intr_n), jnp.asarray(X_n),
            jnp.asarray(fr), jnp.asarray(pt), jnp.asarray(xy),
            jnp.asarray(w), cfg=cfg)
        f_out = np.asarray(out[1][:, 0, 0])
        np.testing.assert_allclose(f_out, f_out[0], rtol=1e-6)
        assert abs(f_out[0] - f_true) < 0.02 * f_true
        assert float(out[4]["final_cost"]) < 0.5 * \
            float(out[4]["initial_cost"])

    def test_shared_intrinsics_unifies_divergent_focals(self, rng):
        """Per-frame DIFFERENT focals must converge to one shared value.

        Regression: the tying projector only ties the focal *step*, so
        without up-front value unification pre-existing per-frame
        differences persisted forever. Also covers the video case where
        some frames carry zero (unset) intrinsics — they must not poison
        the unified value.
        """
        extr, intr, X, tracks, mask = make_bundle(rng, S=5, N=200,
                                                  noise_px=0.2)
        f_true = intr[0, 0, 0]
        intr_n = intr.copy()
        factors = np.array([1.0, 1.08, 0.93, 1.04, 0.97])
        intr_n[:, 0, 0] = intr_n[:, 1, 1] = f_true * factors
        # frame 4: simulate an unregistered video frame (zero K, no obs)
        intr_n[4] = 0.0
        mask = mask.copy()
        mask[4] = False

        fr, pt, xy, w = dense_to_obs(tracks, mask)
        cfg = SparseBAConfig(max_iterations=15, refine_focal=True,
                             shared_intrinsics=True, cg_iters=60)
        out = bundle_adjust_sparse(
            jnp.asarray(extr), jnp.asarray(intr_n), jnp.asarray(X),
            jnp.asarray(fr), jnp.asarray(pt), jnp.asarray(xy),
            jnp.asarray(w), cfg=cfg)
        f_out = np.asarray(out[1][:, 0, 0])
        np.testing.assert_allclose(f_out, f_out[0], rtol=1e-6)
        assert abs(f_out[0] - f_true) < 0.05 * f_true

    def test_behind_camera_costs_more_than_truth(self, rng):
        """Flipped camera must not reach zero cost (parity with lm.py fix)."""
        extr, intr, X, tracks, mask = make_bundle(rng, S=4, N=60)
        flipped = extr.copy()
        F = np.diag([1.0, -1.0, -1.0])
        flipped[1, :, :3] = F @ flipped[1, :, :3]
        flipped[1, :, 3] = F @ flipped[1, :, 3]
        fr, pt, xy, w = dense_to_obs(tracks, mask)
        cfg = SparseBAConfig(max_iterations=1, refine_focal=False)

        def initial_cost(e):
            out = bundle_adjust_sparse(
                jnp.asarray(e), jnp.asarray(intr), jnp.asarray(X),
                jnp.asarray(fr), jnp.asarray(pt), jnp.asarray(xy),
                jnp.asarray(w), cfg=cfg)
            return float(out[4]["initial_cost"])

        assert initial_cost(flipped) > initial_cost(extr) + 1.0
