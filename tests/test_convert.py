"""Torch->Flax conversion: numerical equivalence against torch ops.

These tests build small torch modules (public torch.nn API only), convert
their state_dicts with vggsfm_tpu.models.convert, and assert our Flax
modules reproduce torch outputs — validating both the weight mapping and
the module semantics (packed-QKV attention, pre-LN blocks, NHWC convs).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from vggsfm_tpu.models.convert import _conv, _dense, _mha, _t_conv
from vggsfm_tpu.models.layers import (
    AttnBlock,
    Mlp,
    TorchMultiheadAttention,
    instance_norm,
)


def to_np(t):
    return t.detach().cpu().numpy()


class TestAttention:
    def test_mha_matches_torch(self, rng):
        torch.manual_seed(0)
        dim, heads, B, L = 64, 8, 2, 10
        t_mha = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
        x = torch.randn(B, L, dim)
        want, _ = t_mha(x, x, x)

        sd = {f"attn.{k}": v for k, v in t_mha.state_dict().items()}
        params = {"params": _mha(sd, "attn")}
        ours = TorchMultiheadAttention(dim, heads)
        got = ours.apply(params, jnp.asarray(to_np(x)), jnp.asarray(to_np(x)),
                         jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(got), to_np(want), atol=2e-5)

    def test_cross_attention_matches_torch(self, rng):
        torch.manual_seed(1)
        dim, heads = 32, 4
        t_mha = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
        q = torch.randn(2, 5, dim)
        kv = torch.randn(2, 9, dim)
        want, _ = t_mha(q, kv, kv)

        sd = {f"a.{k}": v for k, v in t_mha.state_dict().items()}
        ours = TorchMultiheadAttention(dim, heads)
        got = ours.apply({"params": _mha(sd, "a")}, jnp.asarray(to_np(q)),
                         jnp.asarray(to_np(kv)), jnp.asarray(to_np(kv)))
        np.testing.assert_allclose(np.asarray(got), to_np(want), atol=2e-5)


class TestConv:
    def test_conv_matches_torch(self, rng):
        torch.manual_seed(2)
        t_conv = torch.nn.Conv2d(3, 8, kernel_size=3, stride=2, padding=1)
        x = torch.randn(2, 3, 16, 16)
        want = to_np(t_conv(x)).transpose(0, 2, 3, 1)

        import flax.linen as nn
        ours = nn.Conv(8, (3, 3), strides=(2, 2), padding=1)
        sd = {"c.weight": t_conv.weight, "c.bias": t_conv.bias}
        params = {"params": _conv(sd, "c")}
        got = ours.apply(params, jnp.asarray(to_np(x).transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_instance_norm_matches_torch(self, rng):
        x = torch.randn(2, 5, 12, 10)
        want = to_np(torch.nn.InstanceNorm2d(5)(x)).transpose(0, 2, 3, 1)
        got = instance_norm(jnp.asarray(to_np(x).transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestBlocks:
    def test_attn_block_matches_torch_composition(self, rng):
        """Reference AttnBlock recomputed with torch primitives."""
        torch.manual_seed(3)
        dim, heads = 32, 4
        t_mha = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
        t_fc1 = torch.nn.Linear(dim, dim * 4)
        t_fc2 = torch.nn.Linear(dim * 4, dim)
        norm = torch.nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)

        x = torch.randn(2, 7, dim)
        h = norm(x)
        a, _ = t_mha(h, h, h)
        h = h + a
        want = h + t_fc2(torch.nn.functional.gelu(t_fc1(norm(h))))

        sd = {}
        for k, v in t_mha.state_dict().items():
            sd[f"b.attn.{k}"] = v
        for k, v in t_fc1.state_dict().items():
            sd[f"b.mlp.fc1.{k}"] = v
        for k, v in t_fc2.state_dict().items():
            sd[f"b.mlp.fc2.{k}"] = v

        from vggsfm_tpu.models.convert import _attn_block
        ours = AttnBlock(dim, heads, 4.0)
        got = ours.apply({"params": _attn_block(sd, "b")},
                         jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(got), to_np(want), atol=2e-5)


class TestDinoAttn:
    def test_qkv_matches_torch(self, rng):
        """DINOv2-style attention: packed qkv Linear + proj."""
        torch.manual_seed(4)
        dim, heads, B, L = 64, 8, 2, 6
        qkv = torch.nn.Linear(dim, dim * 3)
        proj = torch.nn.Linear(dim, dim)
        x = torch.randn(B, L, dim)

        q, k, v = qkv(x).chunk(3, dim=-1)

        def heads_t(t):
            return t.reshape(B, L, heads, dim // heads).transpose(1, 2)

        q, k, v = heads_t(q), heads_t(k), heads_t(v)
        attn = torch.softmax(q @ k.transpose(-2, -1) /
                             np.sqrt(dim // heads), dim=-1)
        want = to_np(proj((attn @ v).transpose(1, 2).reshape(B, L, dim)))

        from vggsfm_tpu.models.dinov2 import DinoAttention
        sd = {}
        for k2, v2 in qkv.state_dict().items():
            sd[f"a.qkv.{k2}"] = v2
        for k2, v2 in proj.state_dict().items():
            sd[f"a.proj.{k2}"] = v2
        params = {"params": {"qkv": _dense(sd, "a.qkv"),
                             "proj": _dense(sd, "a.proj")}}
        ours = DinoAttention(dim, heads)
        got = ours.apply(params, jnp.asarray(to_np(x)))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestDPTHeadConversion:
    """DepthAnythingV2 DPT head: torch replica (public key layout) ->
    convert_dpt_head -> our DPTHead reproduces torch outputs."""

    def _torch_head(self, in_ch, f, out_channels):
        import torch.nn as tnn

        class RCU(tnn.Module):
            def __init__(s):
                super().__init__()
                s.conv1 = tnn.Conv2d(f, f, 3, padding=1)
                s.conv2 = tnn.Conv2d(f, f, 3, padding=1)

            def forward(s, x):
                y = torch.relu(x)
                y = s.conv1(y)
                y = torch.relu(y)
                return x + s.conv2(y)

        class Fusion(tnn.Module):
            def __init__(s):
                super().__init__()
                s.resConfUnit1 = RCU()
                s.resConfUnit2 = RCU()
                s.out_conv = tnn.Conv2d(f, f, 1)

            def forward(s, x, skip=None, size=None):
                if skip is not None:
                    x = x + s.resConfUnit1(skip)
                x = s.resConfUnit2(x)
                kw = ({"scale_factor": 2} if size is None
                      else {"size": size})
                x = torch.nn.functional.interpolate(
                    x, **kw, mode="bilinear", align_corners=True)
                return s.out_conv(x)

        class Scratch(tnn.Module):
            def __init__(s):
                super().__init__()
                for i, oc in enumerate(out_channels):
                    setattr(s, f"layer{i + 1}_rn",
                            tnn.Conv2d(oc, f, 3, padding=1, bias=False))
                for i in range(1, 5):
                    setattr(s, f"refinenet{i}", Fusion())
                s.output_conv1 = tnn.Conv2d(f, f // 2, 3, padding=1)
                s.output_conv2 = tnn.Sequential(
                    tnn.Conv2d(f // 2, 32, 3, padding=1), tnn.ReLU(),
                    tnn.Conv2d(32, 1, 1), tnn.ReLU(), tnn.Identity())

        class Head(tnn.Module):
            def __init__(s):
                super().__init__()
                s.projects = tnn.ModuleList(
                    [tnn.Conv2d(in_ch, oc, 1) for oc in out_channels])
                s.resize_layers = tnn.ModuleList([
                    tnn.ConvTranspose2d(out_channels[0], out_channels[0],
                                        4, stride=4),
                    tnn.ConvTranspose2d(out_channels[1], out_channels[1],
                                        2, stride=2),
                    tnn.Identity(),
                    tnn.Conv2d(out_channels[3], out_channels[3], 3,
                               stride=2, padding=1)])
                s.scratch = Scratch()

            def forward(s, taps, gh, gw, out_hw):
                feats = []
                for i, t in enumerate(taps):
                    x = t.permute(0, 2, 1).reshape(
                        t.shape[0], -1, gh, gw)
                    x = s.projects[i](x)
                    x = s.resize_layers[i](x)
                    feats.append(
                        getattr(s.scratch, f"layer{i + 1}_rn")(x))
                p4 = s.scratch.refinenet4(feats[3],
                                          size=feats[2].shape[2:])
                p3 = s.scratch.refinenet3(p4, feats[2],
                                          size=feats[1].shape[2:])
                p2 = s.scratch.refinenet2(p3, feats[1],
                                          size=feats[0].shape[2:])
                p1 = s.scratch.refinenet1(p2, feats[0])
                out = s.scratch.output_conv1(p1)
                out = torch.nn.functional.interpolate(
                    out, size=out_hw, mode="bilinear",
                    align_corners=True)
                return s.scratch.output_conv2(out)

        return Head()

    def test_head_matches_torch(self, rng):
        from vggsfm_tpu.models.convert import convert_dpt_head
        from vggsfm_tpu.models.dpt import DPTHead

        torch.manual_seed(3)
        in_ch, f = 24, 16
        out_channels = (8, 12, 16, 16)
        gh, gw = 4, 6
        t_head = self._torch_head(in_ch, f, out_channels)
        taps = [torch.randn(2, gh * gw, in_ch) for _ in range(4)]
        with torch.no_grad():
            want = t_head(taps, gh, gw, (gh * 14, gw * 14))
        want = to_np(want)[:, 0]

        sd = {f"depth_head.{k}": v
              for k, v in t_head.state_dict().items()}
        params = {"params": convert_dpt_head(sd)}
        ours = DPTHead(features=f, out_channels=out_channels)
        got = ours.apply(params, [jnp.asarray(to_np(t)) for t in taps],
                         (gh, gw), (gh * 14, gw * 14))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
