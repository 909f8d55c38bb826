"""Multi-view DLT triangulation + LORANSAC track triangulation (pure JAX).

TPU-native re-design of the reference triangulation engine
(vggsfm/utils/triangulation.py:45-135, 650-1017 and
vggsfm/utils/triangulation_helpers.py:27-131, 133-307, 431-587):

  * the per-track multi-view DLT is the smallest eigenvector of a 4x4 normal
    matrix assembled from masked ray residual terms — solved by the batched
    Jacobi eigensolver (`vggsfm_tpu.ops.eigh`), no cuSOLVER batch cap;
  * LORANSAC is expressed with fixed trial budgets: C(S,2) pair trials
    (shuffled, truncated to `max_ransac_iters`), two local-refinement rounds
    over the top-K inlier sets, selection by (inlier count, mean residual)
    via a single argmax — no data-dependent control flow, fully jit-able;
  * everything is batched over tracks; the track axis is the natural
    sharding axis for a device mesh (see vggsfm_tpu.parallel).

Shapes use S = frames, N = tracks, R = RANSAC trials, K = candidates.
"""

from __future__ import annotations

import math
from functools import partial
from itertools import combinations

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.ops.eigh import smallest_eigenvector
from vggsfm_tpu.geometry.cameras import camera_centers
from vggsfm_tpu.utils.precision import f32_matmuls

_RAD2DEG = 180.0 / math.pi
_DEG2RAD = math.pi / 180.0


@f32_matmuls
def multiview_dlt(
    cams_from_world: jax.Array,
    points: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """DLT triangulation of one world point from M views, batched.

    Args:
      cams_from_world: (..., M, 3, 4) extrinsics.
      points: (..., M, 2) normalized (intrinsics-free) image points.
      mask: optional (..., M) weights; masked-out views contribute nothing.

    Returns:
      (..., 3) world points.

    Parity: triangulation_helpers.py:27-98 — minimizes Σ_m ||(I - r rᵀ) P_m X̃||²
    where r is the unit ray [u, v, 1]/||.||; X̃ is the smallest eigenvector of
    the 4x4 normal matrix.
    """
    ones = jnp.ones_like(points[..., :1])
    homo = jnp.concatenate([points, ones], axis=-1)
    ray = homo / jnp.linalg.norm(homo, axis=-1, keepdims=True)
    # A = Σ_m w_m² [P_mᵀP_m − (P_mᵀ r_m)(P_mᵀ r_m)ᵀ]: the projector
    # (I − r rᵀ) is symmetric idempotent, so the normal matrix contracts
    # the view axis directly on the MXU. The naive form materializes the
    # per-view (..., M, 3, 4) residual tensor, whose trailing tiny dims
    # tile to (8, 128) on TPU — a 42x padding blowup that OOMed compiles
    # at production track counts.
    b = jnp.einsum("...ij,...i->...j", cams_from_world, ray)  # (..., M, 4)
    if mask is not None:
        w = (mask * mask)[..., None]
        CtC = jnp.einsum("...mij,...mik,...m->...jk",
                         cams_from_world, cams_from_world, mask * mask)
        A = CtC - jnp.einsum("...mj,...mk->...jk", b * w, b)
    else:
        CtC = jnp.einsum("...mij,...mik->...jk",
                         cams_from_world, cams_from_world)
        A = CtC - jnp.einsum("...mj,...mk->...jk", b, b)
    v = smallest_eigenvector(A)
    w = v[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.where(w < 0, -1e-12, 1e-12), w)
    return v[..., :3] / w


@f32_matmuls
def cheirality_invalid(
    cams_from_world: jax.Array, points3d: jax.Array
) -> jax.Array:
    """True where a point falls behind ANY of its cameras.

    cams_from_world: (..., M, 3, 4); points3d: (..., 3) -> bool (...,).
    Parity: triangulation_helpers.py:100-115.
    """
    R = cams_from_world[..., :, :3, :3]
    t = cams_from_world[..., :, :3, 3]
    z = jnp.einsum("...mj,...j->...m", R[..., 2, :], points3d) + t[..., 2]
    return jnp.any(z <= 0, axis=-1)


@f32_matmuls
def triangulation_angles(
    cams_from_world: jax.Array, points3d: jax.Array, eps: float = 1e-12
) -> jax.Array:
    """Pairwise triangulation angles (degrees) between all M view rays.

    cams_from_world: (..., M, 3, 4); points3d: (..., 3) -> (..., M, M).
    Parity: triangulation_helpers.py:475-587 (law-of-cosines form, folded to
    min(θ, 180-θ)).
    """
    centers = camera_centers(cams_from_world)  # (..., M, 3)
    baseline2 = jnp.sum(
        (centers[..., :, None, :] - centers[..., None, :, :]) ** 2, axis=-1
    )
    ray2 = jnp.sum((points3d[..., None, :] - centers) ** 2, axis=-1)
    denom = 2.0 * jnp.sqrt(ray2[..., :, None] * ray2[..., None, :])
    numer = ray2[..., :, None] + ray2[..., None, :] - baseline2
    bad = denom <= eps
    cos = jnp.where(bad, 1.0, numer) / jnp.where(bad, 1.0, denom)
    ang = jnp.abs(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    ang = jnp.minimum(ang, math.pi - ang)
    return ang * _RAD2DEG


@f32_matmuls
def normalized_angular_error(
    points3d: jax.Array,
    tracks_normalized: jax.Array,
    extrinsics: jax.Array,
) -> jax.Array:
    """Angle between observed ray and candidate-point ray, per view.

    Args:
      points3d: (N, K, 3) candidate world points per track.
      tracks_normalized: (N, S, 2) normalized observations.
      extrinsics: (S, 3, 4).

    Returns:
      (N, K, S) angular errors in radians.

    Parity: triangulation_helpers.py:431-472.
    """
    ones = jnp.ones_like(tracks_normalized[..., :1])
    ray1 = jnp.concatenate([tracks_normalized, ones], axis=-1)  # (N,S,3)
    ray1 = ray1 / jnp.linalg.norm(ray1, axis=-1, keepdims=True)

    R = extrinsics[:, :3, :3]
    t = extrinsics[:, :3, 3]
    # (N,K,S,3) camera-frame candidate points
    ray2 = jnp.einsum("sij,nkj->nksi", R, points3d) + t[None, None, :, :]
    ray2 = ray2 / jnp.maximum(
        jnp.linalg.norm(ray2, axis=-1, keepdims=True), 1e-12
    )
    cos = jnp.sum(ray1[:, None] * ray2, axis=-1)
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def triangulate_by_pair(extrinsics: jax.Array, tracks_normalized: jax.Array):
    """Triangulate query-frame-0 against every other frame.

    Args:
      extrinsics: (S, 3, 4); tracks_normalized: (S, N, 2).

    Returns:
      points3d (S-1, N, 3), cheirality_mask (S-1, N) [True = in front of both],
      tri_angles (S-1, N) degrees.

    Parity: triangulation.py:45-135 (`triangulate_by_pair`).
    """
    S, N, _ = tracks_normalized.shape
    left_extr = jnp.broadcast_to(extrinsics[0:1], (S - 1, 3, 4))
    pair_extr = jnp.stack([left_extr, extrinsics[1:]], axis=1)  # (S-1,2,3,4)
    left_pts = jnp.broadcast_to(tracks_normalized[0:1], (S - 1, N, 2))
    pair_pts = jnp.stack([left_pts, tracks_normalized[1:]], axis=1)
    # -> per (pair, track): M=2 views
    cams = pair_extr[:, None, :, :, :]  # (S-1,1,2,3,4)
    pts = jnp.swapaxes(pair_pts, 1, 2)  # (S-1,N,2views,2) after transpose
    points3d = multiview_dlt(cams, pts)  # cams broadcast via einsum
    cams = jnp.broadcast_to(cams, (S - 1, N, 2, 3, 4))
    invalid = cheirality_invalid(cams, points3d)
    angles = triangulation_angles(cams, points3d)[..., 0, 1]
    return points3d, ~invalid, angles


def generate_ransac_pairs(
    S: int, max_ransac_iters: int, seed: int = 0
) -> np.ndarray:
    """Static host-side trial schedule: shuffled C(S,2) pairs, truncated.

    Parity: triangulation.py:805-815 + triangulation_helpers.py:638-645.
    """
    comb = np.asarray(list(combinations(range(S), 2)), dtype=np.int32)
    if len(comb) > max_ransac_iters:
        rs = np.random.RandomState(seed)
        comb = comb[rs.permutation(len(comb))[:max_ransac_iters]]
    return comb


def _residual_indicator(
    errors: jax.Array, max_error: float, nanvalue: float
):
    """Score candidates by (inlier count, low mean inlier residual).

    errors: (N, K, S) -> indicator (N, K), inlier_num (N, K), mask (N, K, S).
    Parity: two_view_geo/utils.py:63-87.
    """
    inlier_mask = errors <= max_error
    inlier_num = jnp.sum(inlier_mask, axis=-1)
    mean_resid = jnp.sum(
        jnp.where(inlier_mask, errors, 0.0), axis=-1
    ) / jnp.maximum(inlier_num, 1)
    mean_resid = jnp.where(inlier_num == 0, nanvalue, mean_resid)
    mean_resid = jnp.nan_to_num(
        mean_resid, nan=nanvalue, posinf=nanvalue, neginf=nanvalue
    )
    thres = jnp.max(mean_resid) + 1e-6
    indicator = (thres - mean_resid) / thres
    indicator = indicator + inlier_num.astype(errors.dtype)
    return indicator, inlier_num, inlier_mask


def _local_refine(
    tracks_nt: jax.Array,      # (N, S, 2)
    extrinsics: jax.Array,     # (S, 3, 4)
    inlier_mask: jax.Array,    # (N, K, S) bool, per-candidate inliers
    lo_num: int,
    min_tri_angle: float,
    invalid_vis_conf: jax.Array,  # (N, S) bool
    max_rad_error: float,
):
    """One LORANSAC local-refinement round.

    Takes the `lo_num` candidates with most inliers, re-triangulates each from
    its full inlier set, and returns the refined points + angular errors with
    invalidity penalties applied.

    Parity: triangulation.py:959-1017 + triangulation_helpers.py:648-725.
    """
    N, K, S = inlier_mask.shape
    inlier_num = jnp.sum(inlier_mask, axis=-1)  # (N, K)
    _, top_idx = jax.lax.top_k(inlier_num, lo_num)  # (N, lo_num)

    lo_mask = jnp.take_along_axis(inlier_mask, top_idx[..., None], axis=1)
    # (N, lo_num, S)
    cams = jnp.broadcast_to(extrinsics[None, None], (N, lo_num, S, 3, 4))
    pts = jnp.broadcast_to(tracks_nt[:, None], (N, lo_num, S, 2))
    pts = pts * lo_mask[..., None]

    # pass the UNBROADCAST cameras: multiview_dlt's einsums broadcast the
    # (1, 1, S, 3, 4) operand against the (N, lo, S) batch without ever
    # materializing an (N, lo, S, 3, 4) tensor
    lo_points = multiview_dlt(extrinsics[None, None], pts,
                              mask=lo_mask.astype(pts.dtype))
    angles = triangulation_angles(cams, lo_points)  # (N, lo, S, S)
    tri_ok = jnp.any(
        angles.reshape(N, lo_num, S * S) >= min_tri_angle, axis=-1
    )
    che_invalid = cheirality_invalid(cams, lo_points)
    lo_invalid = (~tri_ok) | che_invalid  # (N, lo)

    lo_err = normalized_angular_error(lo_points, tracks_nt, extrinsics)
    lo_err = jnp.nan_to_num(
        lo_err, nan=100 * math.pi, posinf=100 * math.pi, neginf=100 * math.pi
    )
    lo_err = lo_err + jnp.where(lo_invalid[..., None], math.pi, 0.0)
    lo_err = lo_err + jnp.where(invalid_vis_conf[:, None, :], math.pi, 0.0)
    return lo_points, lo_err


@partial(
    jax.jit,
    static_argnames=(
        "max_ransac_iters", "lo_num", "max_angular_error", "min_tri_angle",
    ),
)
def triangulate_tracks_chunk(
    extrinsics: jax.Array,
    tracks_nt: jax.Array,
    ransac_pairs: jax.Array,
    track_vis: jax.Array | None = None,
    track_score: jax.Array | None = None,
    max_ransac_iters: int = 256,
    lo_num: int = 50,
    max_angular_error: float = 2.0,
    min_tri_angle: float = 1.5,
):
    """LORANSAC triangulation of N tracks over S frames (single chunk).

    Args:
      extrinsics: (S, 3, 4).
      tracks_nt: (N, S, 2) normalized tracks (track-major).
      ransac_pairs: (R, 2) int32 trial schedule from `generate_ransac_pairs`.
      track_vis / track_score: (N, S) quality signals; observations with
        vis<=0.05 or score<=0.5 are penalized out (reference thresholds,
        triangulation.py:866-876).

    Returns:
      points3d (N, 3), inlier_num (N,), inlier_mask (N, S).

    Parity: triangulation.py:777-956 (`triangulate_tracks_single_chunk`).
    """
    N, S, _ = tracks_nt.shape
    R = ransac_pairs.shape[0]
    lo_num = min(lo_num, R)
    lo_num_sec = min(10, lo_num)
    max_rad_error = max_angular_error * _DEG2RAD

    # ---- stage 1: pair-trial triangulation -------------------------------
    pair_extr = extrinsics[ransac_pairs]  # (R, 2, 3, 4)
    pair_pts = tracks_nt[:, ransac_pairs, :]  # (N, R, 2 views, 2)
    cams = jnp.broadcast_to(pair_extr[None], (N, R, 2, 3, 4))
    tri_points = multiview_dlt(pair_extr[None], pair_pts)  # (N, R, 3)
    pair_angles = triangulation_angles(cams, tri_points)[..., 0, 1]
    tri_ok = pair_angles >= min_tri_angle
    che_invalid = cheirality_invalid(cams, tri_points)
    invalid = (~tri_ok) | che_invalid  # (N, R)

    err = normalized_angular_error(tri_points, tracks_nt, extrinsics)
    err = err + jnp.where(invalid[..., None], math.pi, 0.0)

    if track_vis is not None and track_score is not None:
        invalid_vis_conf = (track_vis <= 0.05) | (track_score <= 0.5)
    elif track_vis is not None:
        invalid_vis_conf = track_vis <= 0.05
    else:
        invalid_vis_conf = jnp.zeros((N, S), dtype=bool)
    err = err + jnp.where(invalid_vis_conf[:, None, :], math.pi, 0.0)

    inlier_mask = err <= max_rad_error  # (N, R, S)

    # ---- stage 2: two local-refinement rounds ----------------------------
    lo_points, lo_err = _local_refine(
        tracks_nt, extrinsics, inlier_mask, lo_num,
        min_tri_angle, invalid_vis_conf, max_rad_error,
    )
    lo_inlier = lo_err <= max_rad_error
    lo_points2, lo_err2 = _local_refine(
        tracks_nt, extrinsics, lo_inlier, lo_num_sec,
        min_tri_angle, invalid_vis_conf, max_rad_error,
    )

    # ---- stage 3: best-candidate selection -------------------------------
    all_points = jnp.concatenate([tri_points, lo_points, lo_points2], axis=1)
    all_err = jnp.concatenate([err, lo_err, lo_err2], axis=1)
    indicator, inlier_num, inlier_mask_all = _residual_indicator(
        all_err, max_rad_error, nanvalue=2 * math.pi
    )
    best = jnp.argmax(indicator, axis=1)  # (N,)
    take = lambda x: jnp.take_along_axis(
        x, best.reshape(-1, *([1] * (x.ndim - 1))), axis=1
    )[:, 0]
    return take(all_points), take(inlier_num), take(inlier_mask_all)


def triangulate_tracks(
    extrinsics: jax.Array,
    tracks_normalized: jax.Array,
    track_vis: jax.Array | None = None,
    track_score: jax.Array | None = None,
    max_ransac_iters: int = 256,
    lo_num: int = 50,
    max_angular_error: float = 2.0,
    min_tri_angle: float = 1.5,
    # points-x-frames budget per compiled chunk. The reference's 819200
    # (triangulation.py:686, sized for a 32 GB GPU) translates poorly to
    # TPU: every (tracks, trials, 4, 4) normal-matrix/eigensolver tensor
    # tiles its trailing dims to (8, 128), a ~32x padding expansion, so
    # the working set per track is dominated by padding. 32768 keeps the
    # padded peak under ~4 GB at S=8 while each chunk still fills the MXU.
    max_tri_points_num: int = 32_768,
    seed: int = 0,
):
    """Triangulate all tracks, chunking the track axis to bound memory.

    Args:
      extrinsics: (S, 3, 4); tracks_normalized: (S, N, 2) frame-major (API
        parity with reference triangulation.py:677).

    Returns: points3d (N, 3), inlier_num (N,), inlier_mask (N, S).
    """
    S, N, _ = tracks_normalized.shape
    tracks_nt = jnp.swapaxes(tracks_normalized, 0, 1)
    vis_nt = jnp.swapaxes(track_vis, 0, 1) if track_vis is not None else None
    score_nt = (
        jnp.swapaxes(track_score, 0, 1) if track_score is not None else None
    )
    pairs = jnp.asarray(generate_ransac_pairs(S, max_ransac_iters, seed))

    chunk = max(1, max_tri_points_num // max(S, 1))
    if N <= chunk:
        return triangulate_tracks_chunk(
            extrinsics, tracks_nt, pairs, vis_nt, score_nt,
            max_ransac_iters=int(pairs.shape[0]), lo_num=lo_num,
            max_angular_error=max_angular_error, min_tri_angle=min_tri_angle,
        )
    # chunk via lax.map, NOT a Python loop: run_sfm inlines this function
    # 4x, and an unrolled 6-chunk loop once multiplied the LORANSAC
    # subgraph 24x into the whole-solve program (49k HLO lines, ~2 min of
    # XLA compile on its own). The map body compiles once; chunks were
    # always executed serially (the chunking exists to bound memory).
    n_pad = (-N) % chunk
    n_chunks = (N + n_pad) // chunk

    def pad(x):
        return jnp.pad(x, [(0, n_pad)] + [(0, 0)] * (x.ndim - 1))

    tracks_c = pad(tracks_nt).reshape(n_chunks, chunk, S, 2)
    # padded tracks are all-zero -> vis 0 penalizes them out; outputs for
    # the padding are sliced away below
    vis_c = pad(vis_nt if vis_nt is not None
                else jnp.ones((N, S), tracks_nt.dtype))
    vis_c = vis_c.reshape(n_chunks, chunk, S)
    score_c = (pad(score_nt).reshape(n_chunks, chunk, S)
               if score_nt is not None else None)

    def body(args):
        tr, vi, sc = args
        return triangulate_tracks_chunk(
            extrinsics, tr, pairs, vi, sc,
            max_ransac_iters=int(pairs.shape[0]), lo_num=lo_num,
            max_angular_error=max_angular_error,
            min_tri_angle=min_tri_angle,
        )

    if score_c is None:
        pts, num, msk = jax.lax.map(
            lambda a: body((a[0], a[1], None)), (tracks_c, vis_c))
    else:
        pts, num, msk = jax.lax.map(body, (tracks_c, vis_c, score_c))
    return (pts.reshape(-1, 3)[:N], num.reshape(-1)[:N],
            msk.reshape(-1, S)[:N])


@partial(jax.jit, static_argnames=("check_triangle", "hard_max"))
def filter_points3d(
    points3D: jax.Array,
    points2D: jax.Array,
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    extra_params: jax.Array | None = None,
    max_reproj_error: float = 4.0,
    min_tri_angle: float = 1.5,
    check_triangle: bool = True,
    hard_max: float = 300.0,
    obs_mask: jax.Array | None = None,
    return_detail: bool = True,
):
    """Validity mask for triangulated points by reprojection + tri-angle.

    Args:
      points3D: (P, 3); points2D: (B, P, 2) pixel observations;
      extrinsics (B, 3, 4); intrinsics (B, 3, 3).

    Returns:
      valid (P,) bool, inlier_detail (B, P) bool.

    Parity: triangulation_helpers.py:133-307 (`filter_all_points3D`):
    a point is kept if >=2 frames reproject within `max_reproj_error` px,
    coordinates stay under `hard_max`, and (optionally) some inlier pair
    subtends >= `min_tri_angle` degrees.
    """
    from vggsfm_tpu.geometry.cameras import project_points

    B, P, _ = points2D.shape
    proj, points_cam = project_points(
        points3D, extrinsics, intrinsics, extra_params=extra_params,
        return_points_cam=True,
    )
    reproj2 = jnp.sum((proj - points2D) ** 2, axis=-1)
    reproj2 = jnp.where(points_cam[:, 2, :] <= 0, 1e6, reproj2)
    inlier = reproj2 <= max_reproj_error**2  # (B, P)
    if obs_mask is not None:
        inlier &= obs_mask
    valid_track = jnp.sum(inlier, axis=0) >= 2
    if hard_max > 0:
        valid_track &= jnp.all(jnp.abs(points3D) <= hard_max, axis=-1)

    if check_triangle:
        # (B*B, P) pairwise angles from camera centers
        centers = camera_centers(extrinsics)  # (B, 3)
        baseline2 = jnp.sum(
            (centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1
        ).reshape(B * B, 1)
        ray2 = jnp.sum(
            (points3D[None, :, :] - centers[:, None, :]) ** 2, axis=-1
        )  # (B, P)
        r1 = jnp.broadcast_to(ray2[:, None, :], (B, B, P)).reshape(B * B, P)
        r2 = jnp.broadcast_to(ray2[None, :, :], (B, B, P)).reshape(B * B, P)
        denom = 2.0 * jnp.sqrt(r1 * r2)
        numer = r1 + r2 - baseline2
        bad = denom <= 1e-12
        cos = jnp.where(bad, 1.0, numer) / jnp.where(bad, 1.0, denom)
        ang = jnp.abs(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
        ang = jnp.minimum(ang, math.pi - ang) * _RAD2DEG

        pair_inlier = (
            inlier[:, None, :] & inlier[None, :, :]
        ).reshape(B * B, P)
        tri_ok = jnp.any((ang >= min_tri_angle) & pair_inlier, axis=0)
        valid_track &= tri_ok
        inlier_detail = inlier & tri_ok[None, :] & valid_track[None, :]
    else:
        inlier_detail = inlier & valid_track[None, :]
    return valid_track, inlier_detail
