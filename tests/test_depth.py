"""Dense-depth pipeline tests: DPT head, alignment, COLMAP depth IO."""

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.utils.depth import (
    align_disparity_to_depth,
    disparity_to_depth_map,
    read_colmap_array,
    write_colmap_array,
)


class TestDPT:
    def test_depth_anything_shapes(self, rng):
        from vggsfm_tpu.models.dpt import DepthAnything

        model = DepthAnything(tap_layers=(0, 1, 2, 3), features=16)
        # tiny backbone for the test via small input
        x = jnp.asarray(rng.uniform(size=(1, 56, 70, 3)).astype(np.float32))

        # shrink the backbone by overriding module defaults
        from vggsfm_tpu.models.dpt import DPTHead
        import flax.linen as nn

        class Tiny(DepthAnything):
            @nn.compact
            def __call__(self, images):
                from vggsfm_tpu.models.camera import (_RESNET_MEAN,
                                                      _RESNET_STD)
                from vggsfm_tpu.models.dinov2 import DinoVisionTransformer
                B, H, W, _ = images.shape
                xx = (images - _RESNET_MEAN) / _RESNET_STD
                bb = DinoVisionTransformer(embed_dim=32, depth=4,
                                           num_heads=4, pos_embed_size=4,
                                           name="backbone")
                _, taps = bb(xx, return_layers=(0, 1, 2, 3))
                gh, gw = H // 14, W // 14
                return DPTHead(16, out_channels=(8, 16, 24, 32),
                               name="head")(taps, (gh, gw), (H, W))

        tiny = Tiny()
        params = tiny.init(jax.random.PRNGKey(0), x)
        disp = tiny.apply(params, x)
        assert disp.shape == (1, 56, 70)
        assert float(disp.min()) >= 0.0


class TestAlignment:
    def test_recovers_scale_shift(self, rng):
        N = 400
        disp = rng.uniform(0.1, 2.0, size=N).astype(np.float32)
        a_gt, b_gt = 0.7, 0.05
        depth = 1.0 / (a_gt * disp + b_gt)
        # corrupt 20%
        bad = rng.choice(N, N // 5, replace=False)
        depth_noisy = depth.copy()
        depth_noisy[bad] *= rng.uniform(2, 5, size=len(bad))
        a, b, mask = align_disparity_to_depth(
            jnp.asarray(disp), jnp.asarray(depth_noisy),
            jnp.ones(N, bool), jax.random.PRNGKey(0))
        assert abs(float(a) - a_gt) < 0.05
        assert abs(float(b) - b_gt) < 0.05
        full = disparity_to_depth_map(jnp.asarray(disp), a, b)
        good = np.setdiff1d(np.arange(N), bad)
        np.testing.assert_allclose(np.asarray(full)[good], depth[good],
                                   rtol=0.1)


class TestColmapArray:
    def test_roundtrip_single_channel(self, tmp_path, rng):
        arr = rng.normal(size=(17, 23)).astype(np.float32)
        p = str(tmp_path / "depth.bin")
        write_colmap_array(p, arr)
        back = read_colmap_array(p)
        np.testing.assert_allclose(back, arr)

    def test_roundtrip_multichannel(self, tmp_path, rng):
        arr = rng.normal(size=(9, 11, 3)).astype(np.float32)
        p = str(tmp_path / "normals.bin")
        write_colmap_array(p, arr)
        back = read_colmap_array(p)
        np.testing.assert_allclose(back, arr)


class TestAlignDepthMaps:
    def test_planted_disparity_recovers_depth(self, rng):
        """Frames with exact disparity = (1/depth - b)/a must come back
        as metric depth after align_depth_maps_to_sfm."""
        from vggsfm_tpu.utils.depth import align_depth_maps_to_sfm

        S, H, W, N = 2, 24, 32, 200
        a_gt, b_gt = np.float32(0.8), np.float32(0.02)
        # smooth planted depth field
        gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
        depth_field = 2.0 + 0.03 * gx + 0.05 * gy
        disp = ((1.0 / depth_field) - b_gt) / a_gt
        disparity = np.broadcast_to(disp, (S, H, W)).copy()

        # identity cameras; 3D points whose camera depth equals the field
        xs = rng.uniform(1, W - 2, N).astype(np.float32)
        ys = rng.uniform(1, H - 2, N).astype(np.float32)
        z = 2.0 + 0.03 * xs + 0.05 * ys
        f, cx, cy = 30.0, W / 2, H / 2
        X = np.stack([(xs - cx) / f * z, (ys - cy) / f * z, z], axis=-1)
        extr = np.broadcast_to(
            np.eye(3, 4, dtype=np.float32), (S, 3, 4)).copy()
        tracks = np.broadcast_to(np.stack([xs, ys], -1), (S, N, 2)).copy()
        obs = np.ones((S, N), bool)

        dmaps, a, b, inl = align_depth_maps_to_sfm(
            jnp.asarray(disparity), jnp.asarray(extr), jnp.asarray(X),
            jnp.asarray(tracks), jnp.asarray(obs), jax.random.PRNGKey(0))
        assert np.asarray(inl).min() > 0.9
        np.testing.assert_allclose(np.asarray(a), a_gt, rtol=0.05)
        np.testing.assert_allclose(
            np.asarray(dmaps)[0, 2:-2, 2:-2],
            depth_field[2:-2, 2:-2], rtol=0.08)


class TestRunnerDenseDepth:
    def test_dense_stage_and_export(self, tmp_path, rng):
        """dense_reconstruct + save_dense_depth_maps: shapes, files, and
        original-resolution resampling (random DPT weights)."""
        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
        from vggsfm_tpu.utils.depth import read_colmap_array

        S, R = 2, 64
        cfg = RunnerConfig(img_size=R, depth_input_size=140,
                           dense_depth=True, precision="f32")
        runner = VGGSfMRunner(cfg)
        images = jnp.asarray(
            rng.uniform(size=(1, S, R, R, 3)).astype(np.float32))
        N = 50
        predictions = {
            "extrinsics": np.broadcast_to(
                np.eye(3, 4, dtype=np.float32), (S, 3, 4)).copy(),
            "points3d": rng.normal(size=(N, 3)).astype(np.float32) + 4,
            "pred_track": rng.uniform(
                2, R - 2, size=(1, S, N, 2)).astype(np.float32),
            "valid_2d_mask": np.ones((S, N), bool),
            "valid_tracks": np.ones(N, bool),
        }
        runner.dense_reconstruct(images, predictions)
        assert predictions["depth_maps"].shape == (S, R, R)
        assert predictions["depth_align_coeffs"].shape == (S, 2)

        # export at "original" 48x36 resolution through crop_params
        from vggsfm_tpu.datasets.demo_loader import pad_and_resize_image
        raw = (rng.uniform(size=(36, 48, 3)) * 255).astype(np.uint8)
        _, _, par = pad_and_resize_image(raw, R)
        crop_params = np.stack([par] * S)
        runner.save_dense_depth_maps(
            predictions["depth_maps"], ["a.png", "b.png"], str(tmp_path),
            crop_params=crop_params)
        d = read_colmap_array(str(tmp_path / "depths" / "a.bin"))
        assert d.shape == (36, 48)
        assert np.isfinite(d).all()
