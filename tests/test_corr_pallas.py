"""Pallas correlation kernel vs the XLA reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.models.tracker import build_corr_pyramid, corr_sample
from vggsfm_tpu.ops.corr_pallas import corr_sample_pallas


class TestCorrPallas:
    def test_matches_xla_path(self, rng):
        S, H, W, C, N = 2, 32, 32, 128, 24
        fmap = jnp.asarray(rng.normal(size=(S, H, W, C)).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(5, 26, size=(S, N, 2)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(S, N, C)).astype(np.float32))

        want = corr_sample([fmap[None]], coords[None], feats[None],
                           radius=4)[0]
        got = corr_sample_pallas(fmap, coords, feats, radius=4,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)

    def test_border_zeros_padding(self, rng):
        """Taps outside the image must contribute zero, as in the XLA path
        (grid_sample padding_mode='zeros')."""
        S, H, W, C, N = 1, 16, 16, 128, 4
        fmap = jnp.asarray(rng.normal(size=(S, H, W, C)).astype(np.float32))
        coords = jnp.asarray(
            np.array([[[0.5, 0.5], [15.2, 15.7], [1.0, 14.0],
                       [14.9, 0.1]]], np.float32))
        feats = jnp.asarray(rng.normal(size=(S, N, C)).astype(np.float32))
        want = corr_sample([fmap[None]], coords[None], feats[None],
                           radius=3)[0]
        got = corr_sample_pallas(fmap, coords, feats, radius=3,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)

    def test_track_padding(self, rng):
        """N not a multiple of the block size pads transparently."""
        S, H, W, C, N = 1, 32, 32, 128, 13
        fmap = jnp.asarray(rng.normal(size=(S, H, W, C)).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(6, 25, size=(S, N, 2)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(S, N, C)).astype(np.float32))
        want = corr_sample([fmap[None]], coords[None], feats[None],
                           radius=4)[0]
        got = corr_sample_pallas(fmap, coords, feats, radius=4,
                                 interpret=True)
        assert got.shape == (S, N, 81)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)


class TestCorrPallasSmallC:
    """Row-flattened small-channel kernel (fine-former C=32 pyramids)."""

    def test_matches_xla_path(self, rng):
        from vggsfm_tpu.ops.corr_pallas import corr_sample_pallas_smallc

        S, H, W, C, N = 4, 31, 31, 32, 9
        fmap = jnp.asarray(rng.normal(size=(S, H, W, C)).astype(np.float32))
        coords = jnp.asarray(
            rng.uniform(4, 26, size=(S, N, 2)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(S, N, C)).astype(np.float32))
        want = corr_sample([fmap[None]], coords[None], feats[None],
                           radius=3)[0]
        got = corr_sample_pallas_smallc(fmap, coords, feats, radius=3,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)

    def test_border_zeros_and_padding(self, rng):
        from vggsfm_tpu.ops.corr_pallas import corr_sample_pallas_smallc

        S, H, W, C, N = 1, 15, 15, 32, 5  # N pads to the 8-track block
        fmap = jnp.asarray(rng.normal(size=(S, H, W, C)).astype(np.float32))
        coords = jnp.asarray(
            np.array([[[0.3, 0.4], [14.2, 14.6], [0.9, 13.5],
                       [13.8, 0.2], [7.5, 7.5]]], np.float32))
        feats = jnp.asarray(rng.normal(size=(S, N, C)).astype(np.float32))
        want = corr_sample([fmap[None]], coords[None], feats[None],
                           radius=3)[0]
        got = corr_sample_pallas_smallc(fmap, coords, feats, radius=3,
                                        interpret=True)
        assert got.shape == (S, N, 49)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)
