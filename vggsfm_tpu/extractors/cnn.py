"""Learned keypoint extractors wired for query-point dispatch.

Parity: vggsfm/runners/runner.py:1374-1392 — the reference instantiates
LightGlue's ALIKED / SuperPoint and takes their keypoints. Here the CNNs
run in Flax (vggsfm_tpu.extractors.{aliked,superpoint}); score-map peaks
go through the shared NMS + top-K (`superpoint_keypoints_from_heatmap`).

Checkpoints: set ``VGGSFM_TPU_ALIKED_CKPT`` / ``VGGSFM_TPU_SUPERPOINT_CKPT``
to torch checkpoint paths, or call :func:`load_aliked_params` /
:func:`load_superpoint_params` directly. Without a checkpoint the models
run with deterministic random init — still a usable detector (a random
conv-selu score map fires on texture), and the full CNN path is exercised
either way.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from vggsfm_tpu.extractors.aliked import (
    ALIKED,
    SDDH,
    convert_aliked_checkpoint,
    convert_sddh_checkpoint,
)
from vggsfm_tpu.extractors.superpoint import (
    SuperPoint,
    convert_superpoint_checkpoint,
    superpoint_keypoints_from_heatmap,
)

_CACHE: dict = {}


def _load_torch(path):
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def load_aliked_params():
    if "aliked_params" not in _CACHE:
        path = os.environ.get("VGGSFM_TPU_ALIKED_CKPT", "")
        model = ALIKED()
        if path and os.path.exists(path):
            params = jax.tree.map(jnp.asarray,
                                  convert_aliked_checkpoint(_load_torch(path)))
        else:
            # ensure_compile_time_eval: the first load may happen inside
            # an enclosing jit trace (the runner jits the whole query
            # extraction); without it the init would (a) cache TRACERS,
            # poisoning every later program (UnexpectedTracerError), and
            # (b) inline the full random conv init into the compiled
            # program, re-running it on every execution.
            with jax.ensure_compile_time_eval():
                params = jax.jit(model.init)(
                    jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        _CACHE["aliked_params"] = params
    return _CACHE["aliked_params"]


def load_superpoint_params():
    if "superpoint_params" not in _CACHE:
        path = os.environ.get("VGGSFM_TPU_SUPERPOINT_CKPT", "")
        model = SuperPoint()
        if path and os.path.exists(path):
            params = jax.tree.map(
                jnp.asarray, convert_superpoint_checkpoint(_load_torch(path)))
        else:
            with jax.ensure_compile_time_eval():  # see load_aliked_params
                params = jax.jit(model.init)(
                    jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))
        _CACHE["superpoint_params"] = params
    return _CACHE["superpoint_params"]


def _aliked_apply(params, image):
    # bf16 compute (params stay f32): matches the reference's fp16
    # autocast and halves the CNN's bandwidth at detection resolution;
    # scores are cast back to f32 so NMS/top_k compare exactly
    return ALIKED(dtype=jnp.bfloat16).apply(params, image).astype(
        jnp.float32)


def _superpoint_apply(params, image):
    # outputs (heat, desc) are already cast to f32 inside the module
    return SuperPoint(dtype=jnp.bfloat16).apply(params, image)


def detect_aliked_keypoints(image: jax.Array, max_keypoints: int = 4096,
                            nms_radius: int = 2):
    """(H, W, 3) RGB in [0, 1] -> (xy (K, 2), score (K,), valid (K,)).

    ALIKED score map -> NMS peaks, strongest first (the reference's default
    extractor, cfgs/demo.yaml:49).
    """
    if "aliked_apply" not in _CACHE:
        _CACHE["aliked_apply"] = jax.jit(_aliked_apply)
    params = load_aliked_params()
    score_map = _CACHE["aliked_apply"](params, image[None])[0]
    return superpoint_keypoints_from_heatmap(
        score_map, max_keypoints, nms_radius=nms_radius)


def load_sddh_params():
    """SDDH descriptor-head params: converted from the ALIKED checkpoint's
    `desc_head` subtree when VGGSFM_TPU_ALIKED_CKPT is set (and contains
    one), deterministic random init otherwise."""
    if "sddh_params" not in _CACHE:
        path = os.environ.get("VGGSFM_TPU_ALIKED_CKPT", "")
        sd = _load_torch(path) if path and os.path.exists(path) else {}
        if any(str(k).removeprefix("module.").startswith("desc_head.")
               for k in sd):
            params = jax.tree.map(jnp.asarray, convert_sddh_checkpoint(sd))
        else:
            with jax.ensure_compile_time_eval():  # see load_aliked_params
                params = jax.jit(SDDH().init)(
                    jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 128)),
                    jnp.zeros((1, 4, 2)))
        _CACHE["sddh_params"] = params
    return _CACHE["sddh_params"]


def _aliked_describe(aliked_params, sddh_params, image, xy):
    _, feats = ALIKED().apply(aliked_params, image, return_feats=True)
    desc, _ = SDDH().apply(sddh_params, feats, xy)
    return desc


def describe_aliked_keypoints(image: jax.Array, xy: jax.Array):
    """(H, W, 3) image + (K, 2) keypoint pixels -> (K, 128) L2-normalized
    SDDH descriptors (completes the reference's ALIKED surface,
    runners/runner.py:1374-1392; descriptors are unused for query seeding
    but exported for downstream matching)."""
    if "aliked_describe" not in _CACHE:
        _CACHE["aliked_describe"] = jax.jit(_aliked_describe)
    return _CACHE["aliked_describe"](load_aliked_params(),
                                     load_sddh_params(),
                                     image[None], xy[None])[0]


def detect_superpoint_keypoints(image: jax.Array, max_keypoints: int = 4096,
                                nms_radius: int = 4):
    """(H, W) grayscale in [0, 1] -> (xy (K, 2), score (K,), valid (K,))."""
    if "superpoint_apply" not in _CACHE:
        _CACHE["superpoint_apply"] = jax.jit(_superpoint_apply)
    params = load_superpoint_params()
    heat, _ = _CACHE["superpoint_apply"](params, image[None, ..., None])
    return superpoint_keypoints_from_heatmap(
        heat[0], max_keypoints, nms_radius=nms_radius)
