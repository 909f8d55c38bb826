"""Generate tests/fixtures/vggsfm_v2_keys.json — the key/shape manifest
of the reference checkpoint `vggsfm_v2_0_0.bin`.

The reference loads that file with ``load_state_dict(..., strict=True)``
(vggsfm/models/vggsfm.py:50), so the checkpoint's key set is EXACTLY the
``state_dict()`` of the instantiated torch module tree. This script
instantiates the reference's TrackerPredictor + CameraPredictor (with
lightweight stubs for hydra/kornia, which only gate imports) and records
every parameter/buffer name + shape.

The DINOv2 ViT-B/14-reg backbone comes from torch.hub in the reference
(camera_predictor.py:223-236) — unavailable in a zero-egress build — so
its subtree is synthesized from the public facebookresearch/dinov2
naming (vision_transformer.py: packed qkv, LayerScale ls1/ls2.gamma,
4 register tokens, pos_embed for 518 px) and marked as such.

Run:  python tools/gen_keys_manifest.py   (requires /root/reference)
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.util
import json
import os
import sys
import types

REFERENCE = os.environ.get("VGGSFM_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "vggsfm_v2_keys.json")


class NS(dict):
    """Attribute-accessible dict standing in for an OmegaConf node."""

    __getattr__ = dict.__getitem__


class _Dummy:
    """Callable/attribute-absorbing placeholder for import-time names."""

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _Dummy()

    def __bool__(self):
        return True


class _AutoMod(types.ModuleType):
    __path__: list = []

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Dummy()


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        return _AutoMod(spec.name)

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    """Auto-stub entire package trees that only gate imports (the
    manifest never executes kornia/pycolmap code paths)."""

    ROOTS = ("kornia", "pycolmap", "pyceres", "poselib", "lightglue",
             "hydra")

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] in self.ROOTS:
            return importlib.util.spec_from_loader(
                fullname, _StubLoader(), is_package=True)
        return None


def _instantiate(node, _recursive_=None, **kwargs):
    node = dict(node)
    target = node.pop("_target_")
    mod, cls = target.rsplit(".", 1)
    c = getattr(importlib.import_module(mod), cls)
    return c(**{**node, **kwargs})


def install_stubs():
    sys.meta_path.insert(0, _StubFinder())
    hydra_utils = _AutoMod("hydra.utils")
    hydra_utils.instantiate = _instantiate
    sys.modules["hydra.utils"] = hydra_utils

    import torch

    torch.hub.load = lambda *a, **k: torch.nn.Module()  # backbone stub


def dinov2_vitb14_reg_keys(prefix):
    """Public facebookresearch/dinov2 ViT-B/14-with-registers naming."""
    D, MLP, NB = 768, 3072, 12
    keys = {
        f"{prefix}.cls_token": [1, 1, D],
        f"{prefix}.pos_embed": [1, 1370, D],  # 518/14 = 37 -> 37*37 + 1
        f"{prefix}.register_tokens": [1, 4, D],
        f"{prefix}.mask_token": [1, D],
        f"{prefix}.patch_embed.proj.weight": [D, 3, 14, 14],
        f"{prefix}.patch_embed.proj.bias": [D],
        f"{prefix}.norm.weight": [D],
        f"{prefix}.norm.bias": [D],
    }
    for i in range(NB):
        b = f"{prefix}.blocks.{i}"
        keys.update({
            f"{b}.norm1.weight": [D], f"{b}.norm1.bias": [D],
            f"{b}.attn.qkv.weight": [3 * D, D],
            f"{b}.attn.qkv.bias": [3 * D],
            f"{b}.attn.proj.weight": [D, D],
            f"{b}.attn.proj.bias": [D],
            f"{b}.ls1.gamma": [D],
            f"{b}.norm2.weight": [D], f"{b}.norm2.bias": [D],
            f"{b}.mlp.fc1.weight": [MLP, D], f"{b}.mlp.fc1.bias": [MLP],
            f"{b}.mlp.fc2.weight": [D, MLP], f"{b}.mlp.fc2.bias": [D],
            f"{b}.ls2.gamma": [D],
        })
    return keys


def main():
    sys.path.insert(0, REFERENCE)
    install_stubs()

    from vggsfm.models.camera_predictor import CameraPredictor
    from vggsfm.models.track_predictor import TrackerPredictor

    coarse = NS(
        stride=4, down_ratio=2,
        FEATURENET=NS(_target_="vggsfm.models.BasicEncoder"),
        PREDICTOR=NS(_target_="vggsfm.models.BaseTrackerPredictor"),
    )
    fine = NS(
        FEATURENET=NS(_target_="vggsfm.models.ShallowEncoder"),
        PREDICTOR=NS(_target_="vggsfm.models.BaseTrackerPredictor",
                     depth=4, corr_levels=3, corr_radius=3, latent_dim=32,
                     hidden_size=256, fine=True, use_spaceatt=False),
    )
    # base_track_predictor.py:50 reads cfg.MODEL.TRACK.efficient_corr
    cfg = NS(MODEL=NS(TRACK=NS(efficient_corr=False)))
    tracker = TrackerPredictor(coarse, fine, efficient_corr=False,
                               cfg=cfg)
    camera = CameraPredictor()

    manifest = {}
    for k, v in tracker.state_dict().items():
        manifest[f"track_predictor.{k}"] = list(v.shape)
    for k, v in camera.state_dict().items():
        if k.startswith("backbone."):
            continue  # stubbed — synthesized below
        manifest[f"camera_predictor.{k}"] = list(v.shape)
    manifest.update(
        dinov2_vitb14_reg_keys("camera_predictor.backbone"))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump({
            "_comment": "state_dict keys+shapes of vggsfm_v2_0_0.bin: "
                        "track/camera from the instantiated reference "
                        "torch modules; camera_predictor.backbone.* "
                        "synthesized from public dinov2 vitb14_reg "
                        "naming (torch.hub unavailable, zero egress)",
            "keys": manifest,
        }, f, indent=1, sort_keys=True)
    print(f"wrote {len(manifest)} keys -> {OUT}")


if __name__ == "__main__":
    main()
