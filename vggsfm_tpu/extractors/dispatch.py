"""Query-point extraction dispatcher.

Parity: vggsfm/runners/runner.py:1336-1416 (`get_query_points`): run the
configured extractor(s) on the query frame, invalidate masked/out-of-bbox
points, concatenate multiple methods, subsample to `max_query_num`. Here
the methods are combinable with '+' exactly like the reference
('sift+harris' etc.), shapes stay fixed (top-K with validity), and the
random subsample is a jax PRNG permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.extractors.corners import detect_harris_keypoints
from vggsfm_tpu.extractors.dog import detect_dog_keypoints


def _to_gray(image: jax.Array) -> jax.Array:
    if image.ndim == 3:
        return (0.299 * image[..., 0] + 0.587 * image[..., 1]
                + 0.114 * image[..., 2])
    return image


def grid_keypoints(height: int, width: int, num: int):
    """Uniform grid fallback (parity: utils/utils.py:773-815)."""
    n_side = max(2, int(num ** 0.5))
    xs = jnp.linspace(8, width - 8, n_side)
    ys = jnp.linspace(8, height - 8, n_side)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    xy = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
    return xy[:num]


def resolve_query_method(query_method: str) -> str:
    """Resolve the 'auto' extractor default.

    With a trained ALIKED checkpoint (VGGSFM_TPU_ALIKED_CKPT) 'auto'
    selects 'aliked' — the reference default (cfgs/demo.yaml:49), whose
    reference weights are trained. Without one, random-init ALIKED
    measurably loses to the classical detectors on the oracle scene
    (AUC@30 0.82 vs 0.94 for sift+harris, 256px 2-query fine-tracking
    run), so 'auto' ships the measured-best weights-free path instead.
    """
    if query_method != "auto":
        return query_method
    import os

    if os.environ.get("VGGSFM_TPU_ALIKED_CKPT"):
        return "aliked"
    return "sift+harris"


def get_query_points(query_image: jax.Array, key: jax.Array,
                     query_method: str = "sift",
                     max_query_num: int = 4096,
                     seg_invalid_mask: jax.Array | None = None,
                     bound_bbox: jax.Array | None = None):
    """Extract query keypoints from one (H, W, 3) image in [0, 1].

    Returns (xy (max_query_num, 2), valid (max_query_num,)).
    """
    query_method = resolve_query_method(query_method)
    H, W = query_image.shape[:2]
    gray = _to_gray(query_image)

    per_method = max_query_num
    xys, valids = [], []
    for method in query_method.split("+"):
        if method == "sift":
            xy, score, valid = detect_dog_keypoints(gray, per_method)
        elif method == "harris":
            xy, score, valid = detect_harris_keypoints(gray, per_method)
        elif method == "aliked":
            from vggsfm_tpu.extractors.cnn import detect_aliked_keypoints

            rgb = (query_image if query_image.ndim == 3
                   else jnp.repeat(query_image[..., None], 3, axis=-1))
            xy, score, valid = detect_aliked_keypoints(rgb, per_method)
        elif method in ("sp", "superpoint"):
            from vggsfm_tpu.extractors.cnn import (
                detect_superpoint_keypoints,
            )

            xy, score, valid = detect_superpoint_keypoints(gray, per_method)
        elif method == "grid":
            xy = grid_keypoints(H, W, per_method)
            valid = jnp.ones(xy.shape[0], bool)
        else:
            raise ValueError(f"unknown query method {method}")
        xys.append(xy)
        valids.append(valid)

    xy = jnp.concatenate(xys, axis=0)
    valid = jnp.concatenate(valids, axis=0)

    if bound_bbox is not None:
        x0, y0, x1, y1 = bound_bbox
        valid &= ((xy[:, 0] >= x0) & (xy[:, 0] < x1)
                  & (xy[:, 1] >= y0) & (xy[:, 1] < y1))
    if seg_invalid_mask is not None:
        ix = jnp.clip(xy[:, 0].astype(jnp.int32), 0, W - 1)
        iy = jnp.clip(xy[:, 1].astype(jnp.int32), 0, H - 1)
        valid &= ~seg_invalid_mask[iy, ix]

    # valid-first random permutation, truncated to max_query_num
    order = jax.random.permutation(key, xy.shape[0])
    rank = jnp.where(valid[order], 0, 1)
    order = order[jnp.argsort(rank, stable=True)]
    sel = order[:max_query_num]
    return xy[sel], valid[sel]
