"""Multi-query camera prediction averaging + query-frame ranking.

Parity: vggsfm/utils/utils.py:25-164 (`average_camera_prediction`,
quaternion-mean rotation averaging) and :234-308 (query-frame selection:
'midpoint' interval ordering and DINO-similarity farthest-point sampling).
Quaternion averaging here uses sign-aligned mean (the reference averages
scipy quats, relying on consistent hemispheres across predictions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.geometry.cameras import (
    pose_encoding_to_extri_intri,
    se3_compose,
    se3_inverse,
)
from vggsfm_tpu.geometry.rotations import (
    matrix_to_quaternion,
    quaternion_to_matrix,
)


def average_rotations(Rs: jax.Array) -> jax.Array:
    """(Q, N, 3, 3) -> (N, 3, 3): quaternion mean over the Q axis."""
    q = matrix_to_quaternion(Rs)  # (Q, N, 4)
    # align hemispheres to the first prediction before averaging
    sign = jnp.sign(jnp.sum(q * q[0:1], axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    mean = jnp.mean(q * sign, axis=0)
    mean = mean / jnp.maximum(
        jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-12)
    return quaternion_to_matrix(mean)


def average_camera_prediction(camera_forward, images, image_size,
                              query_indices=None, repeat_times: int = 5,
                              seed: int = 0, model_input_size: int = 336):
    """Ensemble the camera predictor over several query orderings.

    All Q orderings run as ONE batched forward: images are pre-resized
    once to the predictor's input resolution (the model's internal resize
    is then a no-op) and the orderings become a (Q, S, 336, 336, 3)
    batch — Q sequential S-frame forwards were measured at ~1.6 s on the
    matched workload purely from under-filled kernels.

    Args:
      camera_forward: images (Q, S, H, W, 3) -> pose encodings (Q, S, 8).
      images: (1, S, H, W, 3).
      image_size: (H, W) of the target camera frame.

    Returns (extrinsics (S, 3, 4), intrinsics (S, 3, 3)) averaged over
    query orderings, relative to frame 0.
    """
    from vggsfm_tpu.models.sampling import interpolate_bilinear

    S = images.shape[1]
    if query_indices is None:
        rng = np.random.default_rng(seed)
        q = min(repeat_times, S)
        query_indices = list(rng.choice(S, size=q, replace=False))
        if 0 not in query_indices:
            query_indices.insert(0, 0)

    orders = []
    for qi in query_indices:
        order = np.arange(S)
        order[0], order[qi] = qi, 0
        orders.append(order)
    orders = np.stack(orders)  # (Q, S)
    Q = orders.shape[0]
    inv_orders = np.argsort(orders, axis=1)

    batch = _build_query_batch(images, jnp.asarray(orders),
                               model_input_size)
    pose_encs = camera_forward(batch)  # (Q, S, 8)
    if tuple(pose_encs.shape[:2]) != (Q, S):
        # JAX clamps out-of-bounds indices, so a wrong leading dim would
        # otherwise SILENTLY reuse ordering 0's prediction for every
        # ordering — fail loudly instead.
        raise ValueError(
            f"camera_forward must return (Q={Q}, S={S}, D) pose encodings "
            f"for a (Q, S, H, W, 3) batch; got {tuple(pose_encs.shape)}")
    return _decode_and_average(pose_encs, jnp.asarray(inv_orders),
                               tuple(image_size))


@partial(jax.jit, static_argnames=("model_input_size",))
def _build_query_batch(images, orders, model_input_size: int):
    """(1, S, H, W, 3) + (Q, S) orderings -> (Q, S, 336, 336, 3).

    One compiled program: resize once, then gather the orderings — the
    eager version paid a tunnel dispatch round-trip per op."""
    from vggsfm_tpu.models.sampling import interpolate_bilinear

    x = images[0]
    if x.shape[1:3] != (model_input_size, model_input_size):
        x = interpolate_bilinear(x, (model_input_size, model_input_size))
    Q, S = orders.shape
    return x[orders.reshape(-1)].reshape((Q, S) + x.shape[1:])


@partial(jax.jit, static_argnames=("image_size",))
def _decode_and_average(pose_encs, inv_orders, image_size):
    """(Q, S, 8) pose encodings -> ensembled (extr (S,3,4), intr (S,3,3)).

    The whole decode -> re-relativize -> quaternion-average pipeline as
    one compiled program (the per-ordering Python loop dispatched ~90
    eager ops over the backend tunnel, ~3 s of pure RPC latency on the
    matched workload)."""

    def one(enc, inv):
        extr, intr = pose_encoding_to_extri_intri(enc, image_size)
        extr = extr[inv]
        intr = intr[inv]
        # re-relativize to (the true) frame 0
        first_inv = se3_inverse(extr[0])
        extr = se3_compose(extr, first_inv[None])
        return (extr[:, :, :3], extr[:, :, 3],
                jnp.stack([intr[:, 0, 0], intr[:, 1, 1]], axis=-1))

    Rs, ts, fs = jax.vmap(one)(pose_encs, inv_orders)
    R = average_rotations(Rs)
    t = jnp.mean(ts, axis=0)
    f = jnp.mean(fs, axis=0)
    S = R.shape[0]
    extr = jnp.concatenate([R, t[..., None]], axis=-1)
    intr = jnp.zeros((S, 3, 3), R.dtype)
    intr = intr.at[:, 0, 0].set(f[:, 0]).at[:, 1, 1].set(f[:, 1])
    intr = intr.at[:, 0, 2].set(image_size[1] / 2.0)
    intr = intr.at[:, 1, 2].set(image_size[0] / 2.0)
    intr = intr.at[:, 2, 2].set(1.0)
    return extr, intr


def rank_by_dino_similarity(features: jax.Array, query_num: int):
    """Farthest-point sampling on frame-level feature similarity.

    Args:
      features: (S, D) per-frame descriptors (e.g. mean DINOv2 patch
        tokens). Returns `query_num` frame indices, frame 0 first.
    Parity: utils/utils.py:265-308 (`generate_rank_by_dino` + FPS).
    """
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    sim = f @ f.T  # (S, S)
    S = sim.shape[0]
    # most-"central" frame first (reference ranks by total similarity)
    order = jnp.argsort(-jnp.sum(sim, axis=1))
    selected = [int(order[0])]
    dist = 1.0 - np.asarray(sim)
    for _ in range(min(query_num, S) - 1):
        d_min = dist[:, selected].min(axis=1)
        d_min[selected] = -1
        selected.append(int(d_min.argmax()))
    if 0 not in selected:
        selected[-1] = 0
    # frame 0 first (pipeline convention)
    selected.sort(key=lambda i: i != 0)
    return selected


def rank_by_midpoint(S: int, query_num: int):
    """Interval/midpoint ordering (utils/utils.py:234-262)."""
    idx = np.linspace(0, S - 1, min(query_num, S)).round().astype(int)
    out = sorted(set(int(i) for i in idx))
    out.sort(key=lambda i: i != 0)
    return out


def rank_by_interval(S: int, k: int):
    """Stride ordering: 0, k, 2k, ..., 1, k+1, ... (utils/utils.py:253-262).

    The reference calls this with k = S // query_num + 1 so the first
    `query_num` entries stride evenly across the sequence.
    """
    out = []
    for start in range(k):
        out.extend(range(start, S, k))
    return out
