"""GT camera normalization + crop/scale intrinsics adjustment.

Behavioral parity: vggsfm/datasets/camera_transform.py:33-258
(`adjust_camera_to_bbox_crop_`, `adjust_camera_to_image_scale_`,
`normalize_cameras` = optical-axis-intersection recentering + first-camera
relativization + translation normalization).

TPU redesign: the reference round-trips through PyTorch3D NDC cameras and
`Transform3d` stacks; everything here is straight OpenCV pixel-space
`K`/`[R|t]` math in batched jnp — no NDC detour, no camera objects. The
optical-axis intersection is the closed-form least-squares skew-line meet
(the reference calls `torch.linalg.lstsq` on the same normal equations).
"""

from __future__ import annotations

import jax.numpy as jnp


def adjust_intrinsics_to_crop(intrinsics, bbox_xywh):
    """Shift principal points for a crop whose top-left is (x, y).

    Args:
      intrinsics: (..., 3, 3) K matrices in pixels.
      bbox_xywh: (..., 4) crop [x, y, w, h] (w/h unused — a crop never
        rescales; kept for parity with the reference's bbox convention).

    Parity: camera_transform.py:33-47 (pixel-space effect of the NDC
    round-trip is exactly `pp -= bbox[:2]`).
    """
    intrinsics = jnp.asarray(intrinsics)
    bbox_xywh = jnp.asarray(bbox_xywh, intrinsics.dtype)
    K = intrinsics.copy()
    return K.at[..., :2, 2].add(-bbox_xywh[..., :2])


def adjust_intrinsics_to_scale(intrinsics, original_wh, new_wh):
    """Rescale K for a resize from `original_wh` to `new_wh`.

    Uses min(new/old) like the reference (aspect-preserving resize;
    camera_transform.py:50-69).
    """
    intrinsics = jnp.asarray(intrinsics)
    original_wh = jnp.asarray(original_wh, intrinsics.dtype)
    new_wh = jnp.asarray(new_wh, intrinsics.dtype)
    scale = jnp.min(new_wh / original_wh, axis=-1)[..., None, None]
    K = intrinsics * scale
    return K.at[..., 2, 2].set(1.0)


def adjust_intrinsics_from_crop_params(intrinsics, crop_params,
                                       img_size: int):
    """Original-pixel K -> model-input-pixel K via the loader's 8-vector.

    ``crop_params = [W, H, crop_width, s, bbox_after(4)]`` as produced by
    `vggsfm_tpu.datasets.demo_loader.crop_parameters` (square crop to
    max(W, H), then resize to ``img_size``). Inverse of the export-time
    rescale in the runner's `save_reconstruction`.
    """
    intrinsics = jnp.asarray(intrinsics)
    crop_params = jnp.asarray(crop_params, intrinsics.dtype)
    crop_dim = jnp.maximum(crop_params[..., 0], crop_params[..., 1])
    bbox = crop_params[..., 4:8] * (crop_dim[..., None] / img_size)
    K = adjust_intrinsics_to_crop(intrinsics, bbox)
    wh = jnp.stack([crop_dim, crop_dim], axis=-1)
    new_wh = jnp.full_like(wh, img_size)
    return adjust_intrinsics_to_scale(K, wh, new_wh)


def optical_axis_intersection(extrinsics):
    """Least-squares meet of the cameras' optical axes.

    Args:
      extrinsics: (S, 3, 4) OpenCV world->cam.

    Returns (point (3,), dist (S,) distance from each camera center).
    Parity: camera_transform.py:163-231 (`compute_optical_axis_intersection`
    + `intersect_skew_lines_high_dim`): solve
    ``sum_s (I - d_s d_s^T) (x - c_s) = 0`` where c_s is the camera center
    and d_s its viewing direction (third row of R, in world coords).
    """
    R = extrinsics[:, :, :3]
    t = extrinsics[:, :, 3]
    centers = -jnp.einsum("sij,si->sj", R, t)  # -R^T t
    dirs = R[:, 2, :]  # world-frame optical axis (unit rows of R)
    eye = jnp.eye(3, dtype=extrinsics.dtype)
    P = eye[None] - dirs[:, :, None] * dirs[:, None, :]  # (S, 3, 3)
    A = jnp.sum(P, axis=0)
    b = jnp.sum(jnp.einsum("sij,sj->si", P, centers), axis=0)
    # A is rank-deficient only when every axis is parallel; lstsq handles it
    point = jnp.linalg.lstsq(A, b)[0]
    dist = jnp.linalg.norm(point[None] - centers, axis=-1)
    return point, dist


def first_camera_transform(extrinsics, points=None):
    """Re-express cameras (and optional points) relative to camera 0.

    Parity: camera_transform.py:237-258.
    """
    R0 = extrinsics[0, :, :3]
    t0 = extrinsics[0, :, 3]
    R = extrinsics[:, :, :3]
    t = extrinsics[:, :, 3]
    R_new = jnp.einsum("sij,kj->sik", R, R0)  # R_s R_0^T
    t_new = t - jnp.einsum("sij,j->si", R_new, t0)
    out = jnp.concatenate([R_new, t_new[..., None]], axis=-1)
    if points is not None:
        points = jnp.einsum("ij,nj->ni", R0, points) + t0[None]
    return out, points


def normalize_cameras(extrinsics, points=None, compute_optical=True,
                      first_camera=True, normalize_trans=True,
                      scale: float = 1.0, max_norm: bool = False):
    """Normalize a GT camera set the way the reference trains/evaluates.

    1. (compute_optical) translate the world so the optical-axis
       intersection is the origin and divide by the first camera's
       distance to it;
    2. (first_camera) re-express everything relative to camera 0;
    3. (normalize_trans) divide translations (and points) by the mean
       (or max with ``max_norm``) translation norm, times ``scale``.

    Args:
      extrinsics: (S, 3, 4) OpenCV world->cam. points: optional (N, 3).

    Returns (extrinsics, points). Parity: camera_transform.py:96-161.
    """
    extr = jnp.asarray(extrinsics)
    R = extr[:, :, :3]
    t = extr[:, :, 3]

    if compute_optical:
        p_int, dist = optical_axis_intersection(extr)
        s = jnp.where(dist[0] > 1e-8, dist[0], 1.0)
        # world shift x -> x - p_int: t' = t + R p_int, then scale
        t = (t + jnp.einsum("sij,j->si", R, p_int)) / s
        extr = jnp.concatenate([R, t[..., None]], axis=-1)
        if points is not None:
            points = (points - p_int[None]) / s

    if first_camera:
        extr, points = first_camera_transform(extr, points)
        t = extr[:, :, 3]

    if normalize_trans:
        norms = jnp.linalg.norm(t, axis=-1)
        denom = jnp.max(norms) if max_norm else jnp.mean(norms)
        denom = jnp.where(denom > 1e-8, denom, 1.0) / scale
        t = t / denom
        extr = jnp.concatenate([extr[:, :, :3], t[..., None]], axis=-1)
        if points is not None:
            points = points / denom

    return extr, points
