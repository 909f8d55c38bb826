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


class TestALIKEDConverter:
    def _torch_replica(self):
        """Official-ALIKED-shaped torch module (score branch, n16 dims
        scaled down) with the official checkpoint key naming."""
        import torch
        import torch.nn as nn

        class ConvBlock(nn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
                self.bn1 = nn.BatchNorm2d(cout)
                self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
                self.bn2 = nn.BatchNorm2d(cout)

            def forward(self, x):
                x = torch.selu(self.bn1(self.conv1(x)))
                return torch.selu(self.bn2(self.conv2(x)))

        class ResBlock(nn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.conv1 = nn.Conv2d(cin, cout, 3, padding=1, bias=False)
                self.bn1 = nn.BatchNorm2d(cout)
                self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
                self.bn2 = nn.BatchNorm2d(cout)
                self.downsample = nn.Conv2d(cin, cout, 1, bias=False)

            def forward(self, x):
                y = torch.selu(self.bn1(self.conv1(x)))
                y = self.bn2(self.conv2(y))
                return torch.selu(self.downsample(x) + y)

        class Net(nn.Module):
            def __init__(self, c1=4, c2=8, c3=8, c4=8, dim=8):
                super().__init__()
                self.block1 = ConvBlock(3, c1)
                self.block2 = ResBlock(c1, c2)
                self.block3 = ResBlock(c2, c3)
                self.block4 = ResBlock(c3, c4)
                self.conv1 = nn.Conv2d(c1, dim // 4, 1, bias=False)
                self.conv2 = nn.Conv2d(c2, dim // 4, 1, bias=False)
                self.conv3 = nn.Conv2d(c3, dim // 4, 1, bias=False)
                self.conv4 = nn.Conv2d(c4, dim // 4, 1, bias=False)
                self.score_head = nn.Sequential(
                    nn.Conv2d(dim, 8, 1, bias=False), nn.SELU(),
                    nn.Conv2d(8, 4, 3, padding=1, bias=False), nn.SELU(),
                    nn.Conv2d(4, 4, 3, padding=1, bias=False), nn.SELU(),
                    nn.Conv2d(4, 1, 3, padding=1, bias=False))
                self.pool2 = nn.AvgPool2d(2, 2)
                self.pool4 = nn.AvgPool2d(4, 4)

            def forward(self, img):
                import torch.nn.functional as F
                H, W = img.shape[-2:]
                x1 = self.block1(img)
                x2 = self.block2(self.pool2(x1))
                x3 = self.block3(self.pool4(x2))
                x4 = self.block4(self.pool4(x3))
                def up(t):
                    return F.interpolate(t, size=(H, W), mode="bilinear",
                                         align_corners=True)
                f = torch.cat([torch.selu(self.conv1(x1)),
                               up(torch.selu(self.conv2(x2))),
                               up(torch.selu(self.conv3(x3))),
                               up(torch.selu(self.conv4(x4)))], dim=1)
                return torch.sigmoid(self.score_head(f))[:, 0]

        return Net()

    def test_converted_scores_match_torch(self, rng):
        import torch

        from vggsfm_tpu.extractors.aliked import (
            ALIKED,
            convert_aliked_checkpoint,
        )

        net = self._torch_replica().eval()
        # randomize BN running stats so folding is actually exercised
        with torch.no_grad():
            for m in net.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 2.0)
                    m.weight.uniform_(0.5, 1.5)
                    m.bias.uniform_(-0.5, 0.5)

        x = rng.uniform(size=(1, 3, 64, 64)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()

        params = convert_aliked_checkpoint(net.state_dict())
        model = ALIKED(c1=4, c2=8, c3=8, c4=8, dim=8)
        got = np.asarray(model.apply(
            jax.tree.map(jnp.asarray, params),
            jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, ref, atol=2e-5)


class TestCNNDispatch:
    def test_aliked_and_sp_query_methods_run_cnn(self, rng):
        """query_method aliked/sp must route through the CNNs (random
        weights) and produce valid in-bounds keypoints."""
        import jax

        from vggsfm_tpu.extractors import get_query_points

        img = jnp.asarray(rng.uniform(size=(96, 96, 3)).astype(np.float32))
        for method in ("aliked", "sp"):
            xy, valid = get_query_points(img, jax.random.PRNGKey(0),
                                         method, 64)
            xy = np.asarray(xy)
            assert xy.shape == (64, 2)
            assert np.asarray(valid).sum() > 0
            assert xy.min() >= 0 and xy.max() < 96


class TestAutoQueryMethod:
    def test_auto_without_ckpt_is_classical(self, monkeypatch):
        from vggsfm_tpu.extractors.dispatch import resolve_query_method

        monkeypatch.delenv("VGGSFM_TPU_ALIKED_CKPT", raising=False)
        assert resolve_query_method("auto") == "sift+harris"

    def test_auto_with_ckpt_is_aliked(self, monkeypatch):
        from vggsfm_tpu.extractors.dispatch import resolve_query_method

        monkeypatch.setenv("VGGSFM_TPU_ALIKED_CKPT", "/tmp/x.pth")
        assert resolve_query_method("auto") == "aliked"

    def test_explicit_method_passes_through(self):
        from vggsfm_tpu.extractors.dispatch import resolve_query_method

        assert resolve_query_method("sp+sift") == "sp+sift"
