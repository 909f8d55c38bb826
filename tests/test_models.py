"""Shape/behavior tests for the neural model stack (random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.models import (
    BaseTrackerPredictor,
    BasicEncoder,
    CameraPredictor,
    DinoVisionTransformer,
    ShallowEncoder,
    TrackerPredictor,
)
from vggsfm_tpu.models.embeddings import get_2d_embedding, \
    get_2d_sincos_pos_embed
from vggsfm_tpu.models.sampling import (
    bilinear_sample,
    interpolate_bilinear,
    sample_features4d,
)
from vggsfm_tpu.models.tracker import build_corr_pyramid, corr_sample


class TestSampling:
    def test_bilinear_exact_at_integer_coords(self, rng):
        fmap = jnp.asarray(rng.normal(size=(2, 8, 10, 4)).astype(np.float32))
        coords = jnp.asarray([[[3.0, 2.0], [0.0, 0.0], [9.0, 7.0]]] * 2)
        out = bilinear_sample(fmap, coords)
        np.testing.assert_allclose(np.asarray(out[0, 0]),
                                   np.asarray(fmap[0, 2, 3]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1, 2]),
                                   np.asarray(fmap[1, 7, 9]), atol=1e-6)

    def test_bilinear_midpoint_average(self, rng):
        fmap = jnp.asarray(rng.normal(size=(1, 4, 4, 1)).astype(np.float32))
        out = bilinear_sample(fmap, jnp.asarray([[[0.5, 0.0]]]))
        want = 0.5 * (fmap[0, 0, 0, 0] + fmap[0, 0, 1, 0])
        np.testing.assert_allclose(float(out[0, 0, 0]), float(want),
                                   atol=1e-6)

    def test_zeros_padding(self, rng):
        fmap = jnp.ones((1, 4, 4, 1))
        out = bilinear_sample(fmap, jnp.asarray([[[-0.5, 0.0]]]),
                              padding_mode="zeros")
        np.testing.assert_allclose(float(out[0, 0, 0]), 0.5, atol=1e-6)
        out_b = bilinear_sample(fmap, jnp.asarray([[[-0.5, 0.0]]]),
                                padding_mode="border")
        np.testing.assert_allclose(float(out_b[0, 0, 0]), 1.0, atol=1e-6)

    def test_interpolate_identity(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
        y = interpolate_bilinear(x, (6, 6))
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


class TestEmbeddings:
    def test_2d_sincos_shape_and_range(self):
        e = get_2d_sincos_pos_embed(64, (8, 10))
        assert e.shape == (1, 8, 10, 64)
        assert float(jnp.max(jnp.abs(e))) <= 1.0 + 1e-6

    def test_2d_embedding_shape(self, rng):
        xy = jnp.asarray(rng.normal(size=(2, 5, 2)).astype(np.float32))
        e = get_2d_embedding(xy, 64, cat_coords=False)
        assert e.shape == (2, 5, 128)
        e2 = get_2d_embedding(xy, 64, cat_coords=True)
        assert e2.shape == (2, 5, 130)
        np.testing.assert_allclose(np.asarray(e2[..., :2]), np.asarray(xy))


class TestCorr:
    def test_corr_matches_explicit_dot(self, rng):
        B, S, H, W, C = 1, 2, 16, 16, 8
        fmaps = jnp.asarray(rng.normal(size=(B, S, H, W, C)).astype(np.float32))
        pyramid = build_corr_pyramid(fmaps, 2)
        coords = jnp.asarray([[[[4.0, 5.0]], [[8.0, 3.0]]]])  # (1,2,1,2)
        tfeats = jnp.asarray(rng.normal(size=(B, S, 1, C)).astype(np.float32))
        corr = corr_sample(pyramid, coords, tfeats, radius=1)
        assert corr.shape == (B, S, 1, 2 * 9)
        # center tap of level 0 equals direct dot at the (integer) coord
        want = float(jnp.dot(fmaps[0, 0, 5, 4], tfeats[0, 0, 0])
                     / jnp.sqrt(C))
        got = float(corr[0, 0, 0, 4])  # center of the 3x3 window
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestCorrSmallMapPath:
    def test_small_map_matches_gather_path(self, rng):
        """The dot-then-slice small-map branch (H*W <= 1156) must agree
        with the gather branch bit-for-bit in f32, including fractional
        coords and out-of-bounds windows (zero padding semantics)."""
        B, S, N, C = 1, 2, 7, 8
        H = W = 30  # 900 cells -> small path
        fm_small = rng.normal(size=(B, S, H, W, C)).astype(np.float32)
        # embed the same map in a 40x40 (1600 cells -> gather path) canvas
        fm_big = np.zeros((B, S, 40, 40, C), np.float32)
        fm_big[:, :, :H, :W] = fm_small
        tf = rng.normal(size=(B, S, N, C)).astype(np.float32)
        coords = np.array([
            [3.25, 4.75], [0.0, 0.0], [28.9, 28.1], [-0.4, 5.0],
            [5.0, -3.0], [29.0, 0.5], [-10.0, -10.0],
        ], np.float32)[None, None].repeat(S, 1)

        small = corr_sample([jnp.asarray(fm_small)], jnp.asarray(coords),
                            jnp.asarray(tf), radius=2)
        big = corr_sample([jnp.asarray(fm_big)], jnp.asarray(coords),
                          jnp.asarray(tf), radius=2)
        # windows whose taps stay inside [0, 30) see identical data; taps
        # beyond are zeros in the small map and zeros (pad region) in the
        # big map, so everything matches everywhere
        np.testing.assert_allclose(np.asarray(small), np.asarray(big),
                                   atol=1e-5)


class TestEncoders:
    def test_basic_encoder_shapes(self, rng):
        enc = BasicEncoder(output_dim=128, stride=4)
        x = jnp.zeros((2, 64, 64, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 16, 16, 128)

    def test_shallow_encoder_shapes(self, rng):
        enc = ShallowEncoder(output_dim=32, stride=1)
        x = jnp.zeros((2, 31, 31, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 31, 31, 32)


class TestTracker:
    def test_transformer_dim_matches_reference(self):
        coarse = BaseTrackerPredictor()
        assert coarse.transformer_dim == 664  # 5*81 + 256 -> pad to /4
        fine = BaseTrackerPredictor(depth=4, corr_levels=3, corr_radius=3,
                                    latent_dim=32, hidden_size=256,
                                    fine=True, use_spaceatt=False)
        assert fine.transformer_dim == 216  # 3*49 + 64 = 211 (odd) + 5

    def test_base_predictor_forward(self, rng):
        B, S, N = 1, 3, 8
        model = BaseTrackerPredictor(depth=2, corr_levels=2, corr_radius=2,
                                     latent_dim=16, hidden_size=64,
                                     use_spaceatt=True)
        fmaps = jnp.asarray(
            rng.normal(size=(B, S, 32, 32, 16)).astype(np.float32))
        qp = jnp.asarray(rng.uniform(10, 100, size=(B, N, 2)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), qp, fmaps, iters=2)
        preds, vis = model.apply(params, qp, fmaps, iters=2)
        assert len(preds) == 2
        assert preds[-1].shape == (B, S, N, 2)
        assert vis.shape == (B, S, N)
        assert float(vis.min()) >= 0 and float(vis.max()) <= 1
        # query frame coords pinned to the query points
        np.testing.assert_allclose(np.asarray(preds[-1][:, 0]),
                                   np.asarray(qp), atol=1e-4)

    def test_full_tracker_forward(self, rng):
        model = TrackerPredictor()
        images = jnp.asarray(
            rng.uniform(size=(1, 2, 64, 64, 3)).astype(np.float32))
        qp = jnp.asarray(rng.uniform(5, 59, size=(1, 4, 2)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), images, qp,
                            coarse_iters=2)
        track, vis = model.apply(params, images, qp, coarse_iters=2)
        assert track.shape == (1, 2, 4, 2)
        assert vis.shape == (1, 2, 4)


class TestCameraPredictor:
    def test_forward_shapes(self, rng):
        images = jnp.asarray(
            rng.uniform(size=(1, 3, 28, 28, 3)).astype(np.float32))
        tiny = CameraPredictor(hidden_size=64, num_heads=4, z_dim=768,
                               down_size=28, att_depth=2, trunk_depth=2)
        params = tiny.init(jax.random.PRNGKey(0), images, iters=2)
        out = tiny.apply(params, images, iters=2)
        assert out["pred_pose_enc"].shape == (1, 3, 8)
        assert out["rgb_feat_init"].shape[0:2] == (1, 3)


class TestDino:
    def test_patch_tokens(self, rng):
        model = DinoVisionTransformer(embed_dim=32, depth=2, num_heads=4,
                                      patch_size=14, pos_embed_size=4)
        x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (2, 4, 32)
