"""Preliminary relative cameras from tracks: F -> E -> (R, t) per pair.

Parity: vggsfm/two_view_geo/estimate_preliminary.py:98-239 (batched path; we
do not reimplement the per-pair CPU poselib fallback :37-95 — the batched
estimator *is* the TPU path) and :242-271 (default intrinsics).

Differences from the reference, by design:
  * cameras stay in OpenCV convention end-to-end (the reference converts to
    PyTorch3D and back purely for legacy reasons, :196-221);
  * the frame axis folds into the batch: all S-1 (query, frame) pairs run as
    one batched LORANSAC — this axis is the natural mesh-sharding axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vggsfm_tpu.geometry.cameras import build_intrinsics
from vggsfm_tpu.twoview.essential import (
    decompose_essential_matrix,
    essential_from_fundamental,
    remove_cheirality,
)
from vggsfm_tpu.twoview.fundamental import estimate_fundamental


def default_intrinsics(width: float, height: float, dtype=jnp.float32):
    """f = max(W, H), principal point at the image center.

    Parity: two_view_geo/utils.py:492-513.
    """
    focal = float(max(width, height))
    return build_intrinsics(
        jnp.array([focal, focal], dtype=dtype),
        jnp.array([width / 2.0, height / 2.0], dtype=dtype),
    )


@partial(jax.jit, static_argnames=(
    "width", "height", "max_error", "lo_num", "max_ransac_iters"))
def estimate_preliminary_cameras(
    tracks: jax.Array,
    tracks_vis: jax.Array,
    width: int,
    height: int,
    key: jax.Array,
    tracks_score: jax.Array | None = None,
    max_error: float = 0.5,
    lo_num: int = 128,
    max_ransac_iters: int = 1024,
):
    """Relative cameras of every frame w.r.t. the query frame (frame 0).

    Args:
      tracks: (B, S, N, 2) 2D tracks, frame 0 is the query frame.
      tracks_vis: (B, S, N) visibility in [0, 1].
      tracks_score: optional (B, S, N) confidence.

    Returns a dict:
      ``extrinsics`` (B, S, 3, 4) world->cam OpenCV, frame 0 = identity;
      ``fmat`` (B, S-1, 3, 3); ``fmat_inlier_mask`` (B, S-1, N);
      ``fmat_residuals`` (B, S-1, N); ``default_intri`` (3, 3).
    """
    B, S, N, _ = tracks.shape
    P = B * (S - 1)

    query = jnp.broadcast_to(tracks[:, 0:1], (B, S - 1, N, 2)).reshape(P, N, 2)
    ref = tracks[:, 1:].reshape(P, N, 2)

    valid = (tracks_vis >= 0.05)[:, 1:].reshape(P, N)
    if tracks_score is not None:
        valid &= (tracks_score >= 0.5)[:, 1:].reshape(P, N)

    fres = estimate_fundamental(
        query, ref, key,
        max_ransac_iters=max_ransac_iters,
        max_error=max_error,
        lo_num=lo_num,
        valid_mask=valid,
    )
    fmat = fres["fmat"]

    K = default_intrinsics(width, height, dtype=tracks.dtype)
    Kb = jnp.broadcast_to(K, (P, 3, 3))
    emat = essential_from_fundamental(fmat, Kb, Kb)
    Rs, ts = decompose_essential_matrix(emat)

    fl = jnp.broadcast_to(jnp.array([K[0, 0], K[1, 1], K[0, 0], K[1, 1]],
                                    dtype=tracks.dtype), (P, 4))
    pp = jnp.broadcast_to(jnp.array([K[0, 2], K[1, 2], K[0, 2], K[1, 2]],
                                    dtype=tracks.dtype), (P, 4))
    R, t = remove_cheirality(Rs, ts, query, ref, fl, pp)

    rel = jnp.concatenate([R, t[..., None]], axis=-1).reshape(B, S - 1, 3, 4)
    eye = jnp.broadcast_to(jnp.eye(3, 4, dtype=tracks.dtype), (B, 1, 3, 4))
    extrinsics = jnp.concatenate([eye, rel], axis=1)

    return {
        "extrinsics": extrinsics,
        "fmat": fmat.reshape(B, S - 1, 3, 3),
        "fmat_inlier_mask": fres["inlier_mask"].reshape(B, S - 1, N),
        "fmat_residuals": fres["residuals"].reshape(B, S - 1, N),
        "default_intri": K,
    }
