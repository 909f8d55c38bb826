"""Multi-host machinery: observation-sharded distributed BA + window
partitioning (vggsfm_tpu/parallel/multihost.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.ba import SparseBAConfig, bundle_adjust_sparse
from vggsfm_tpu.parallel.mesh import make_mesh
from vggsfm_tpu.parallel.multihost import (
    distributed_bundle_adjust,
    windows_for_host,
)
from tests.test_ba import make_bundle
from tests.test_sparse_ba import dense_to_obs


class TestDistributedBA:
    def test_sharded_matches_single_device(self, rng):
        """shard_map over 8 virtual devices with psum'd reductions must
        reproduce the single-device solve (same math, same sums)."""
        extr, intr, X, tracks, mask = make_bundle(rng, S=5, N=160,
                                                  noise_px=0.3)
        extr_n = extr.copy()
        extr_n[1:, :, 3] += rng.normal(scale=0.03, size=(4, 3))
        X_n = X + rng.normal(scale=0.05, size=X.shape)
        fr, pt, xy, w = dense_to_obs(tracks, mask)

        cfg = SparseBAConfig(max_iterations=8, refine_focal=False,
                             cg_iters=40)
        base = bundle_adjust_sparse(
            jnp.asarray(extr_n), jnp.asarray(intr), jnp.asarray(X_n),
            jnp.asarray(fr), jnp.asarray(pt), jnp.asarray(xy),
            jnp.asarray(w), cfg=cfg)

        mesh = make_mesh(8, frames_axis=1)  # all 8 devices on `points`
        extr_o, intr_o, _, X_o, cost = distributed_bundle_adjust(
            mesh, extr_n, intr, X_n, fr, pt, xy, w, cfg=cfg)

        # psum reassociation vs the single-device sum order: ~1e-4-level
        # float drift over 8 LM iterations is expected
        np.testing.assert_allclose(np.asarray(extr_o),
                                   np.asarray(base[0]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(X_o), np.asarray(base[3]),
                                   atol=5e-3)
        assert abs(float(cost) - float(base[4]["final_cost"])) \
            <= 1e-3 * max(1.0, float(base[4]["final_cost"]))

    def test_padding_to_shard_multiple_is_inert(self, rng):
        """Observation count not divisible by the axis size: weight-0
        padding must not change the solution."""
        extr, intr, X, tracks, mask = make_bundle(rng, S=4, N=61)
        fr, pt, xy, w = dense_to_obs(tracks, mask)
        assert len(fr) % 8 != 0
        cfg = SparseBAConfig(max_iterations=4, refine_focal=False)
        mesh = make_mesh(8, frames_axis=1)
        extr_o, _, _, X_o, _ = distributed_bundle_adjust(
            mesh, extr, intr, X, fr, pt, xy, w, cfg=cfg)
        # already at the optimum: the solve must stay there
        np.testing.assert_allclose(np.asarray(extr_o), extr, atol=1e-4)


class TestWindowPartition:
    def test_windows_cover_and_disjoint(self):
        T, init, w, H = 103, 16, 8, 4
        allw = [windows_for_host(T, init, w, H, h) for h in range(H)]
        flat = sorted(r for ws in allw for r in ws)
        # coverage: starts at init, contiguous, ends at T
        assert flat[0][0] == init
        assert flat[-1][1] == T
        for (a, b), (c, d) in zip(flat, flat[1:]):
            assert b == c
        # balance: no host owns more than ceil(total/H) windows
        counts = [len(ws) for ws in allw]
        assert max(counts) - min(counts) <= 1
