"""Torch checkpoint -> Flax parameter conversion.

The reference ships weights as a torch ``state_dict``
(vggsfm_v2_0_0.bin, vggsfm/models/vggsfm.py:37-51, HF hub). This module
maps those tensors onto our Flax modules:

  * Conv2d   OIHW  -> HWIO kernels,
  * Linear   (out, in) -> (in, out) kernels,
  * torch.nn.MultiheadAttention packed in_proj -> our `in_proj` Dense,
  * LayerNorm/GroupNorm weight/bias -> scale/bias,
  * DINOv2 ViT blocks (qkv packed, LayerScale gammas).

Conversion is pure numpy — no torch import needed (state_dicts are loaded
with `torch.load` by the caller or any unpickler producing numpy arrays).
"""

from __future__ import annotations

import numpy as np


def _arr(w):
    if hasattr(w, "detach"):  # torch tensor (possibly requiring grad)
        w = w.detach().cpu().numpy()
    return np.asarray(w)


def _t_conv(w):  # OIHW -> HWIO
    return np.transpose(_arr(w), (2, 3, 1, 0))


def _t_lin(w):  # (out, in) -> (in, out)
    return np.transpose(_arr(w), (1, 0))


def _dense(sd, prefix):
    return {"kernel": _t_lin(sd[f"{prefix}.weight"]),
            "bias": _arr(sd[f"{prefix}.bias"])}


def _conv(sd, prefix):
    return {"kernel": _t_conv(sd[f"{prefix}.weight"]),
            "bias": _arr(sd[f"{prefix}.bias"])}


def _mha(sd, prefix):
    return {
        "in_proj": {"kernel": _t_lin(sd[f"{prefix}.in_proj_weight"]),
                    "bias": _arr(sd[f"{prefix}.in_proj_bias"])},
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def _mlp(sd, prefix):
    return {"fc1": _dense(sd, f"{prefix}.fc1"),
            "fc2": _dense(sd, f"{prefix}.fc2")}


def _attn_block(sd, prefix):
    return {"attn": _mha(sd, f"{prefix}.attn"),
            "mlp": _mlp(sd, f"{prefix}.mlp")}


def _cross_block(sd, prefix):
    return {
        "cross_attn": _mha(sd, f"{prefix}.cross_attn"),
        "norm_context": {"scale": _arr(sd[f"{prefix}.norm_context.weight"]),
                         "bias": _arr(sd[f"{prefix}.norm_context.bias"])},
        "mlp": _mlp(sd, f"{prefix}.mlp"),
    }


def _residual_block(sd, prefix, strided: bool):
    out = {"conv1": _conv(sd, f"{prefix}.conv1"),
           "conv2": _conv(sd, f"{prefix}.conv2")}
    if strided:
        out["downsample"] = _conv(sd, f"{prefix}.downsample.0")
    return out


def convert_basic_encoder(sd, prefix="coarse_fnet"):
    """BasicEncoder params (track_modules/blocks.py:25-100)."""
    out = {
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
        "conv3": _conv(sd, f"{prefix}.conv3"),
    }
    strides = {"layer1": 1, "layer2": 2, "layer3": 2, "layer4": 2}
    for name, s in strides.items():
        out[f"{name}_0"] = _residual_block(sd, f"{prefix}.{name}.0", s != 1)
        out[f"{name}_1"] = _residual_block(sd, f"{prefix}.{name}.1", False)
    return out


def convert_shallow_encoder(sd, prefix="fine_fnet"):
    return {
        "conv1": _conv(sd, f"{prefix}.conv1"),
        "conv2": _conv(sd, f"{prefix}.conv2"),
        "layer1": _residual_block(sd, f"{prefix}.layer1", True),
        "layer2": _residual_block(sd, f"{prefix}.layer2", True),
    }


def convert_update_former(sd, prefix, time_depth=6, space_depth=6,
                          add_space_attn=True):
    out = {
        "input_transform": _dense(sd, f"{prefix}.input_transform"),
        "flow_head": _dense(sd, f"{prefix}.flow_head"),
    }
    if add_space_attn:
        # reference typo: 'virual_tracks' (blocks.py:222)
        out["virtual_tracks"] = _arr(sd[f"{prefix}.virual_tracks"])
    for i in range(time_depth):
        out[f"time_blocks_{i}"] = _attn_block(sd, f"{prefix}.time_blocks.{i}")
    if add_space_attn:
        for j in range(space_depth):
            out[f"space_virtual_blocks_{j}"] = _attn_block(
                sd, f"{prefix}.space_virtual_blocks.{j}")
            out[f"space_point2virtual_blocks_{j}"] = _cross_block(
                sd, f"{prefix}.space_point2virtual_blocks.{j}")
            out[f"space_virtual2point_blocks_{j}"] = _cross_block(
                sd, f"{prefix}.space_virtual2point_blocks.{j}")
    return out


def convert_base_predictor(sd, prefix, depth=6, use_spaceatt=True,
                           fine=False):
    out = {
        "updateformer": convert_update_former(
            sd, f"{prefix}.updateformer", time_depth=depth,
            space_depth=depth if use_spaceatt else 0,
            add_space_attn=use_spaceatt),
        "norm_scale": _arr(sd[f"{prefix}.norm.weight"]),
        "norm_bias": _arr(sd[f"{prefix}.norm.bias"]),
        "ffeat_updater": _dense(sd, f"{prefix}.ffeat_updater.0"),
    }
    if not fine:
        out["vis_predictor"] = _dense(sd, f"{prefix}.vis_predictor.0")
    return out


def convert_tracker(sd, prefix="track_predictor"):
    """Full TrackerPredictor params from a reference state_dict."""
    return {
        "coarse_fnet": convert_basic_encoder(sd, f"{prefix}.coarse_fnet"),
        "fine_fnet": convert_shallow_encoder(sd, f"{prefix}.fine_fnet"),
        "coarse_predictor": convert_base_predictor(
            sd, f"{prefix}.coarse_predictor", depth=6, use_spaceatt=True),
        "fine_predictor": convert_base_predictor(
            sd, f"{prefix}.fine_predictor", depth=4, use_spaceatt=False,
            fine=True),
    }


def convert_dinov2(sd, prefix="backbone", depth=12):
    # DINOv2 without registers (DepthAnythingV2's encoder) has no
    # register_tokens tensor; our module then runs num_register_tokens=0
    # with an empty (1, 0, C) parameter
    if f"{prefix}.register_tokens" in sd:
        regs = _arr(sd[f"{prefix}.register_tokens"])
    else:
        dim = _arr(sd[f"{prefix}.cls_token"]).shape[-1]
        regs = np.zeros((1, 0, dim), np.float32)
    # dinov2 checkpoints carry a mask_token for masked-image-modeling
    # pretraining; inference never uses it. Consume it so a strict
    # keys-coverage audit (parity_check.py) stays clean.
    if f"{prefix}.mask_token" in sd:
        _arr(sd[f"{prefix}.mask_token"])
    out = {
        "cls_token": _arr(sd[f"{prefix}.cls_token"]),
        "register_tokens": regs,
        "pos_embed": _arr(sd[f"{prefix}.pos_embed"]),
        "patch_embed": _conv(sd, f"{prefix}.patch_embed.proj"),
        "norm": {"scale": _arr(sd[f"{prefix}.norm.weight"]),
                 "bias": _arr(sd[f"{prefix}.norm.bias"])},
    }
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        out[f"blocks_{i}"] = {
            "norm1": {"scale": _arr(sd[f"{b}.norm1.weight"]),
                      "bias": _arr(sd[f"{b}.norm1.bias"])},
            "norm2": {"scale": _arr(sd[f"{b}.norm2.weight"]),
                      "bias": _arr(sd[f"{b}.norm2.bias"])},
            "attn": {"qkv": _dense(sd, f"{b}.attn.qkv"),
                     "proj": _dense(sd, f"{b}.attn.proj")},
            "mlp_fc1": _dense(sd, f"{b}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{b}.mlp.fc2"),
            "ls1_gamma": _arr(sd[f"{b}.ls1.gamma"]),
            "ls2_gamma": _arr(sd[f"{b}.ls2.gamma"]),
        }
    return out


def convert_camera_predictor(sd, prefix="camera_predictor", att_depth=8,
                             trunk_depth=4):
    out = {
        "backbone": convert_dinov2(sd, f"{prefix}.backbone"),
        "input_transform": _mlp(sd, f"{prefix}.input_transform"),
        "pose_token": _arr(sd[f"{prefix}.pose_token"]),
        "pose_branch": _mlp(sd, f"{prefix}.pose_branch"),
        "ffeat_updater": _dense(sd, f"{prefix}.ffeat_updater.0"),
    }
    for i in range(att_depth):
        out[f"self_att_{i}"] = _attn_block(sd, f"{prefix}.self_att.{i}")
        out[f"cross_att_{i}"] = _cross_block(sd, f"{prefix}.cross_att.{i}")
    for i in range(trunk_depth):
        out[f"trunk_{i}"] = _attn_block(sd, f"{prefix}.trunk.{i}")
    return out


def _t_deconv(w):
    """torch ConvTranspose2d (in, out, kH, kW) -> flax (kH, kW, in, out).

    flax.linen.ConvTranspose (lax.conv_transpose, transpose_kernel=False)
    convolves the dilated input with the kernel in *convolution*
    orientation, i.e. spatially flipped relative to torch's scatter
    semantics — so the spatial taps are reversed here (validated against
    torch in tests/test_convert.py).
    """
    return np.ascontiguousarray(
        np.transpose(_arr(w), (2, 3, 0, 1))[::-1, ::-1])


def _deconv(sd, prefix):
    return {"kernel": _t_deconv(sd[f"{prefix}.weight"]),
            "bias": _arr(sd[f"{prefix}.bias"])}


def _rcu(sd, prefix):
    return {"conv1": _conv(sd, f"{prefix}.conv1"),
            "conv2": _conv(sd, f"{prefix}.conv2")}


def convert_dpt_head(sd, prefix="depth_head"):
    """DepthAnythingV2 DPTHead state_dict -> our DPTHead params.

    Key layout (public DepthAnythingV2 repo, use_clstoken=False):
    projects.{i} 1x1 convs, resize_layers.{0,1} ConvTranspose2d /
    {3} stride-2 Conv2d, scratch.layer{1-4}_rn bias-free 3x3,
    scratch.refinenet{1-4}.{resConfUnit1,resConfUnit2,out_conv},
    scratch.output_conv1 and output_conv2.{0,2}.
    """
    out = {}
    for i in range(4):
        out[f"project_{i}"] = _conv(sd, f"{prefix}.projects.{i}")
        out[f"layer_rn_{i}"] = {
            "kernel": _t_conv(sd[f"{prefix}.scratch.layer{i + 1}_rn.weight"])}
    out["resize_0"] = _deconv(sd, f"{prefix}.resize_layers.0")
    out["resize_1"] = _deconv(sd, f"{prefix}.resize_layers.1")
    out["resize_3"] = _conv(sd, f"{prefix}.resize_layers.3")
    # refinenet4 fuses the coarsest level (our fusion_3) ... refinenet1 the
    # finest (fusion_0); refinenet4's resConfUnit1 exists in the
    # checkpoint but is architecturally unused (single-input fusion)
    for i, rn in ((3, 1), (2, 2), (1, 3), (0, 4)):
        p = f"{prefix}.scratch.refinenet{rn}"
        blk = {"rcu2": _rcu(sd, f"{p}.resConfUnit2"),
               "project": _conv(sd, f"{p}.out_conv")}
        if i != 3:
            blk["rcu1"] = _rcu(sd, f"{p}.resConfUnit1")
        out[f"fusion_{i}"] = blk
    out["head_conv1"] = _conv(sd, f"{prefix}.scratch.output_conv1")
    out["head_conv2"] = _conv(sd, f"{prefix}.scratch.output_conv2.0")
    out["head_conv3"] = _conv(sd, f"{prefix}.scratch.output_conv2.2")
    return out


def convert_depth_anything(state_dict) -> dict:
    """DepthAnythingV2 checkpoint (depth_anything_v2_vit{s,b,l}.pth,
    reference runner.py:147-160) -> DepthAnything Flax params."""
    sd = {k: _arr(v) for k, v in state_dict.items()}
    depth = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("pretrained.blocks."))
    return {"params": {
        "backbone": convert_dinov2(sd, "pretrained", depth=depth),
        "head": convert_dpt_head(sd, "depth_head"),
    }}


def convert_vggsfm_checkpoint(state_dict) -> dict:
    """Reference vggsfm_v2_0_0.bin state_dict -> {tracker, camera} params.

    Values may be torch tensors or numpy arrays; every leaf read goes
    through `_arr` (detach/cpu/np.asarray), so the mapping is consumed
    key-by-key — parity_check.py's audit wraps it in a recording dict to
    prove the converter touches exactly the checkpoint's key set (do NOT
    rebuild the dict here; that would bypass the recording).
    """
    return {
        "tracker": {"params": convert_tracker(state_dict)},
        "camera": {"params": convert_camera_predictor(state_dict)},
    }
