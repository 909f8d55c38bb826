"""Nistér 5-point essential solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_twoview import make_two_view_scene
from vggsfm_tpu.twoview.five_point import estimate_essential, run_5point


def normalized_pair(rng, n, noise=0.0, outlier_frac=0.0):
    x1, x2, F, E_gt, R, t, K, n_out = make_two_view_scene(
        rng, n=n, noise=noise, outlier_frac=outlier_frac)
    x1n = (x1 - K[:2, 2]) / K[0, 0]
    x2n = (x2 - K[:2, 2]) / K[0, 0]
    return x1n, x2n, E_gt / np.linalg.norm(E_gt), R, t, K, n_out


class TestRun5Point:
    def test_exact_minimal_sample(self, rng):
        x1n, x2n, E_gt, *_ = normalized_pair(rng, 5)
        Es, valid = run_5point(jnp.asarray(x1n, jnp.float32)[None],
                               jnp.asarray(x2n, jnp.float32)[None])
        Es, valid = np.asarray(Es)[0], np.asarray(valid)[0]
        assert valid.sum() >= 1
        errs = [min(np.abs(Es[k] - E_gt).max(), np.abs(Es[k] + E_gt).max())
                for k in range(10) if valid[k]]
        assert min(errs) < 1e-3

    def test_solutions_satisfy_epipolar(self, rng):
        x1n, x2n, *_ = normalized_pair(rng, 5)
        Es, valid = run_5point(jnp.asarray(x1n, jnp.float32)[None],
                               jnp.asarray(x2n, jnp.float32)[None])
        p1 = np.concatenate([x1n, np.ones((5, 1))], 1)
        p2 = np.concatenate([x2n, np.ones((5, 1))], 1)
        for k in range(10):
            if not bool(valid[0, k]):
                continue
            resid = np.abs(np.einsum("ni,ij,nj->n", p2,
                                     np.asarray(Es[0, k]), p1)).max()
            assert resid < 1e-4


class TestEstimateEssential:
    def test_ransac_with_noise_and_outliers(self, rng):
        x1n, x2n, E_gt, R, t, K, n_out = normalized_pair(
            rng, 200, noise=0.3, outlier_frac=0.2)
        out = estimate_essential(
            jnp.asarray(x1n, jnp.float32)[None],
            jnp.asarray(x2n, jnp.float32)[None],
            jax.random.PRNGKey(0), max_ransac_iters=64,
            max_error=2.0, focal_length=float(K[0, 0]))
        E = np.asarray(out["emat"][0])
        err = min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max())
        assert err < 0.1  # minimal-solver E before any refinement
        mask = np.asarray(out["inlier_mask"][0])
        assert mask[:n_out].sum() < 0.15 * n_out
        assert int(out["inlier_num"][0]) > 0.8 * (200 - n_out)
