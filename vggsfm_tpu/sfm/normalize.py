"""Reconstruction gauge normalization + post-BA observation hygiene.

Parity: pycolmap `reconstruction.normalize(5.0, 0.1, 0.9, True)` called by
the reference around every joint/global BA (vggsfm/utils/triangulation.py
:1212-1218 `filter_reconstruction`, runners/video_runner.py:494-541
`joint_BA`), and `ObservationManager.filter_all_points3D(reproj, tri_angle)`
+ `filter_observations_with_negative_depth` (COLMAP observation culling).

Host-side numpy: these run between jitted solver stages on registry-shaped
(ragged) data; the arithmetic is trivial next to the solves.
"""

from __future__ import annotations

import numpy as np


def normalize_similarity(extrinsics: np.ndarray,
                         registered: np.ndarray | None = None,
                         extent: float = 5.0,
                         p0: float = 0.1,
                         p1: float = 0.9):
    """Compute the COLMAP Normalize() similarity from camera centers.

    COLMAP semantics (colmap/scene/reconstruction.cc Normalize): sort the
    camera projection centers per axis, trim to the [p0, p1] percentile
    range, take the trimmed per-axis mean as the centroid and the norm of
    the trimmed bounding-box diagonal as the old extent; the transform is
    x -> (extent / old_extent) * (x - centroid).

    Returns (scale, centroid). Caller applies via `apply_similarity`.
    """
    extr = np.asarray(extrinsics, np.float64)
    if registered is not None:
        extr = extr[np.asarray(registered, bool)]
    if len(extr) == 0:
        return 1.0, np.zeros(3)
    R = extr[:, :, :3]
    t = extr[:, :, 3]
    centers = -np.einsum("sij,si->sj", R, t)  # c = -R^T t

    coords = np.sort(centers, axis=0)  # per-axis sort, COLMAP-style
    n = len(coords)
    i0 = int(p0 * (n - 1))
    i1 = int(p1 * (n - 1))
    trimmed = coords[i0:i1 + 1]
    centroid = trimmed.mean(axis=0)
    bbox_min = trimmed[0]
    bbox_max = trimmed[-1]
    old_extent = float(np.linalg.norm(bbox_max - bbox_min))
    scale = extent / old_extent if old_extent > 1e-12 else 1.0
    return scale, centroid


def apply_similarity(extrinsics: np.ndarray, points3d: np.ndarray,
                     scale: float, centroid: np.ndarray):
    """Apply x -> scale * (x - centroid) to a reconstruction in place.

    Camera centers transform as points: c' = s (c - centroid), so with
    t = -R c the new translation is t' = s (t + R @ centroid).
    """
    extr = np.asarray(extrinsics)
    R = extr[:, :, :3]
    extr[:, :, 3] = scale * (extr[:, :, 3]
                             + np.einsum("sij,j->si", R, centroid))
    pts = np.asarray(points3d)
    pts[:] = scale * (pts - centroid)
    return extrinsics, points3d


def normalize_reconstruction(extrinsics, points3d, registered=None,
                             extent: float = 5.0, p0: float = 0.1,
                             p1: float = 0.9):
    """In-place COLMAP-style gauge normalization; returns (scale, centroid)."""
    scale, centroid = normalize_similarity(extrinsics, registered,
                                           extent, p0, p1)
    apply_similarity(extrinsics, points3d, scale, centroid)
    return scale, centroid


def _max_pairwise_angle_deg(dirs: np.ndarray) -> float:
    """Max pairwise angle of a small set of unit vectors (diameter pass:
    furthest-from-mean, then furthest-from-that — exact for the convex
    direction bundles triangulated tracks produce)."""
    if len(dirs) < 2:
        return 0.0
    mean = dirs.mean(axis=0)
    mean /= max(np.linalg.norm(mean), 1e-12)
    a = dirs[np.argmin(dirs @ mean)]
    b = dirs[np.argmin(dirs @ a)]
    return float(np.degrees(np.arccos(np.clip(a @ b, -1.0, 1.0))))


def filter_map_observations(reg, extrinsics, intrinsics, extra=None,
                            max_reproj_error: float = 2.0,
                            min_tri_angle: float = 1.5) -> dict:
    """COLMAP `filter_all_points3D` on a MapRegistry, in place.

    1. drop observations with reprojection error > `max_reproj_error` px
       or non-positive depth;
    2. drop points whose maximum pairwise triangulation angle falls below
       `min_tri_angle` degrees, or that retain < 2 observations;
    3. compact the point store and re-index surviving observations.

    Returns {"dropped_obs": int, "dropped_points": int}.
    """
    from vggsfm_tpu.geometry.distortion import apply_distortion

    P = reg.num_points
    n_obs = len(reg.obs_frame)
    if P == 0 or n_obs == 0:
        return {"dropped_obs": 0, "dropped_points": 0}

    extr = np.asarray(extrinsics, np.float64)
    intr = np.asarray(intrinsics, np.float64)
    R = extr[reg.obs_frame, :, :3]
    t = extr[reg.obs_frame, :, 3]
    X = reg.xyz[reg.obs_point].astype(np.float64)
    Xc = np.einsum("oij,oj->oi", R, X) + t
    depth = Xc[:, 2]
    xn = Xc[:, :2] / np.maximum(depth[:, None], 1e-12)
    if extra is not None:
        import jax.numpy as jnp

        du, dv = apply_distortion(
            jnp.asarray(np.asarray(extra)[reg.obs_frame]),
            jnp.asarray(xn[:, 0:1]), jnp.asarray(xn[:, 1:2]))
        xn = np.concatenate([np.asarray(du), np.asarray(dv)], axis=1)
    f = intr[reg.obs_frame, 0, 0]
    pp = intr[reg.obs_frame, :2, 2]
    px = xn * f[:, None] + pp
    err = np.linalg.norm(px - reg.obs_xy, axis=1)
    obs_ok = (err <= max_reproj_error) & (depth > 0)

    # per-point max pairwise triangulation angle over surviving rays
    centers = -np.einsum("sij,si->sj", extr[:, :, :3], extr[:, :, 3])
    dirs = reg.xyz[reg.obs_point] - centers[reg.obs_frame]
    dirs = dirs / np.maximum(
        np.linalg.norm(dirs, axis=1, keepdims=True), 1e-12)
    order = np.argsort(reg.obs_point[obs_ok], kind="stable")
    sp = reg.obs_point[obs_ok][order]
    sd = dirs[obs_ok][order]
    point_ok = np.zeros((P,), bool)
    starts = np.searchsorted(sp, np.arange(P))
    ends = np.searchsorted(sp, np.arange(P) + 1)
    for p in np.nonzero(ends - starts >= 2)[0]:
        if _max_pairwise_angle_deg(sd[starts[p]:ends[p]]) >= min_tri_angle:
            point_ok[p] = True

    keep_obs = obs_ok & point_ok[reg.obs_point]
    dropped_obs = int(n_obs - keep_obs.sum())
    dropped_points = int(P - point_ok.sum())

    remap = np.cumsum(point_ok) - 1  # old id -> new id
    reg.xyz = reg.xyz[point_ok]
    reg.obs_frame = reg.obs_frame[keep_obs]
    reg.obs_point = remap[reg.obs_point[keep_obs]].astype(np.int32)
    reg.obs_xy = reg.obs_xy[keep_obs]
    return {"dropped_obs": dropped_obs, "dropped_points": dropped_points}
