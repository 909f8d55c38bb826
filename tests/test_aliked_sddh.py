"""SDDH descriptor head vs a torch replica on random weights.

The official ALIKED code is not present in this environment (LightGlue is
an external dep of the reference, runners/runner.py:1374-1392), so — as
with every converted module in this repo — correctness is established
against a torch replica implementing the same published architecture
(arXiv 2304.03608): deformable offsets from a k x k patch, bilinear
sampling at keypoint+offset, sf_conv projection, convM aggregation,
L2 normalization. The replica consumes the converter's expected key set.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vggsfm_tpu.extractors.aliked import SDDH, convert_sddh_checkpoint

C, DIM, K, P = 32, 64, 3, 4


class TorchSDDH(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.offset_conv = torch.nn.Sequential(
            torch.nn.Conv2d(C, 2 * P, K), torch.nn.SELU(),
            torch.nn.Conv2d(2 * P, 2 * P, 1))
        self.sf_conv = torch.nn.Conv2d(C, C, 1, bias=False)
        self.convM = torch.nn.Conv2d(C * P, DIM, 1, bias=False)

    def forward(self, fmap, kpts):
        # fmap (1, C, H, W), kpts (N, 2) xy pixels
        _, _, H, W = fmap.shape
        N = kpts.shape[0]
        half = K // 2
        ctr = torch.round(kpts).long()
        patches = []
        for i in range(N):
            x0 = ctr[i, 0].item()
            y0 = ctr[i, 1].item()
            xs = torch.clamp(torch.arange(x0 - half, x0 + half + 1),
                             0, W - 1)
            ys = torch.clamp(torch.arange(y0 - half, y0 + half + 1),
                             0, H - 1)
            patches.append(fmap[0][:, ys][:, :, xs])
        patch = torch.stack(patches)  # (N, C, K, K)
        off = self.offset_conv(patch).view(N, P, 2)
        off = off.clamp(-max(H, W) / 4.0, max(H, W) / 4.0)
        pos = kpts[:, None, :] + off  # (N, P, 2)
        grid = 2.0 * pos / torch.tensor([W - 1.0, H - 1.0]) - 1.0
        sampled = F.grid_sample(fmap, grid.view(1, N, P, 2),
                                mode="bilinear", padding_mode="border",
                                align_corners=True)  # (1, C, N, P)
        h = F.selu(self.sf_conv(sampled))[0]  # (C, N, P)
        h = h.permute(1, 2, 0).reshape(N, P * C)  # position-major
        d = self.convM(h[:, :, None, None])[:, :, 0, 0]
        return F.normalize(d, p=2, dim=1), off


class TestSDDH:
    @pytest.fixture(scope="class")
    def replica(self):
        torch.manual_seed(3)
        m = TorchSDDH().eval()
        # non-trivial offsets: inflate the offset convs' random weights
        with torch.no_grad():
            for p in m.offset_conv.parameters():
                p.mul_(8.0)
        return m

    def test_matches_torch_replica(self, replica):
        rng = np.random.default_rng(0)
        H = W = 24
        fmap = rng.normal(size=(1, H, W, C)).astype(np.float32)
        kpts = rng.uniform(3, 20, size=(6, 2)).astype(np.float32)

        with torch.no_grad():
            d_t, off_t = replica(
                torch.from_numpy(fmap).permute(0, 3, 1, 2),
                torch.from_numpy(kpts))

        sd = {f"desc_head.{k}": v for k, v in replica.state_dict().items()}
        params = convert_sddh_checkpoint(sd)
        model = SDDH(dim=DIM, kernel_size=K, n_pos=P)
        d_j, off_j = model.apply(params, jnp.asarray(fmap),
                                 jnp.asarray(kpts)[None])
        np.testing.assert_allclose(np.asarray(off_j)[0],
                                   off_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d_j)[0], d_t.numpy(),
                                   atol=1e-4)

    def test_descriptors_normalized_and_shaped(self):
        from vggsfm_tpu.extractors.cnn import describe_aliked_keypoints

        rng = np.random.default_rng(1)
        img = rng.uniform(size=(40, 40, 3)).astype(np.float32)
        xy = rng.uniform(5, 35, size=(9, 2)).astype(np.float32)
        desc = np.asarray(describe_aliked_keypoints(jnp.asarray(img),
                                                    jnp.asarray(xy)))
        assert desc.shape == (9, 128)
        np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0,
                                   atol=1e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
