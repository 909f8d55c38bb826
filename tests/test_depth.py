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
