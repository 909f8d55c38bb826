"""SuperPoint architecture shape + heatmap-keypoint tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.extractors.superpoint import (
    SuperPoint,
    superpoint_keypoints_from_heatmap,
)


class TestSuperPoint:
    def test_forward_shapes(self, rng):
        model = SuperPoint()
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        heat, desc = model.apply(params, x)
        assert heat.shape == (1, 64, 64)
        assert desc.shape == (1, 8, 8, 256)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(desc, axis=-1)), 1.0, atol=1e-5)

    def test_keypoints_from_heatmap(self, rng):
        heat = np.zeros((64, 64), np.float32)
        peaks = [(10, 20), (40, 12), (50, 50)]
        for y, x in peaks:
            heat[y, x] = 1.0
        heat += rng.uniform(size=heat.shape).astype(np.float32) * 1e-3
        xy, score, valid = superpoint_keypoints_from_heatmap(
            jnp.asarray(heat), max_keypoints=8)
        got = {(int(y), int(x)) for x, y in np.asarray(xy[:3])}
        assert got == set(peaks)


class TestALIKED:
    def test_score_map_shapes(self, rng):
        import jax
        import jax.numpy as jnp

        from vggsfm_tpu.extractors.aliked import ALIKED

        model = ALIKED(c1=8, c2=8, c3=16, c4=16, dim=16)
        x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        score = model.apply(params, x)
        assert score.shape == (1, 64, 64)
        assert float(score.min()) >= 0 and float(score.max()) <= 1
