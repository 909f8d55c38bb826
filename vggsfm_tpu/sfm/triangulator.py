"""End-to-end SfM solve: init pair -> init BA -> pose refine -> global BA.

Parity: vggsfm/models/triangulator.py:44-476 (`Triangulator.forward`,
`find_best_initial_pair`, `triangulate_tracks_and_BA`) and
vggsfm/utils/triangulation.py:138-257 (`init_BA`), :1020-1073 (`global_BA`),
:1076-1209 (`iterative_global_BA`).

TPU redesign:
  * every array keeps its full padded shape (N tracks) across the whole
    solve; validity is a mask, never a gather — so each stage jits once and
    is reusable across scenes of the same padded size;
  * the reference's threshold-relaxation loop for the init pair
    (triangulator.py:442-476) is evaluated for all candidate thresholds at
    once and selected branchlessly;
  * all BA stages are the in-graph LM solver (vggsfm_tpu.ba) — no host
    round-trips; the reference's "restore camera if BA made it invalid"
    fallbacks become `where` masks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vggsfm_tpu.ba import BAConfig, bundle_adjust
from vggsfm_tpu.geometry.cameras import cam_from_img
from vggsfm_tpu.ops.triangulation import (
    filter_points3d,
    triangulate_by_pair,
    triangulate_tracks,
)
from vggsfm_tpu.sfm.refine import camera_validity_mask, refine_poses


@dataclasses.dataclass(frozen=True)
class SfmConfig:
    # matched to the reference's 4.0 px (cfgs/demo.yaml:34) after the
    # noise-swept A/B in tools/ab_gates.py (see ROADMAP "quality gates")
    init_max_reproj_error: float = 4.0
    max_reproj_error: float = 4.0
    init_tri_angle_thres: float = 16.0
    min_valid_track_length: int = 3
    robust_refine: int = 2
    ba_iters: int = 2
    shared_camera: bool = False
    camera_type: str = "SIMPLE_PINHOLE"
    refine_focal: bool = True
    ba_max_iterations: int = 25
    max_ransac_iters: int = 256
    vis_thresh: float = 0.05
    score_thresh: float = 0.5


def find_best_initial_pair(inlier_geo_vis, cheirality_mask, tri_angles,
                           init_tri_angle_thres):
    """Pick the (query, frame) pair whose pairwise cloud has most inliers.

    Evaluates the reference's relax-the-threshold retry loop
    (triangulator.py:442-476: halve the angle threshold up to 5 times until
    >= 100 inliers covering >= 25% of tracks) over all candidate thresholds
    in one shot and selects the first acceptable one branchlessly.

    Returns (inlier_total (S-1, N) for the winning threshold, init_idx).
    """
    N = inlier_geo_vis.shape[-1]
    thresholds = jnp.asarray(
        [max(init_tri_angle_thres / 2**k, 2.0) for k in range(5)])
    base = inlier_geo_vis & cheirality_mask  # (S-1, N)

    tri_ok = tri_angles[None] >= thresholds[:, None, None]  # (T, S-1, N)
    inlier_total = base[None] & tri_ok
    per_frame = jnp.sum(inlier_total, axis=-1)  # (T, S-1)
    best_count = jnp.max(per_frame, axis=-1)  # (T,)
    acceptable = (best_count >= 100) & (best_count / N >= 0.25)
    # first acceptable threshold, else the last (most relaxed)
    t_idx = jnp.where(jnp.any(acceptable), jnp.argmax(acceptable),
                      len(thresholds) - 1)
    chosen = inlier_total[t_idx]
    init_idx = jnp.argmax(jnp.sum(chosen, axis=-1))
    return chosen, init_idx


def _ba_cfg(cfg: SfmConfig, max_iterations=None) -> BAConfig:
    return BAConfig(
        max_iterations=max_iterations or cfg.ba_max_iterations,
        refine_focal=cfg.refine_focal,
        refine_extra=cfg.camera_type != "SIMPLE_PINHOLE",
        shared_intrinsics=cfg.shared_camera,
    )


def _restore_invalid(new, old, valid):
    extr = jnp.where(valid[:, None, None], new[0], old[0])
    intr = jnp.where(valid[:, None, None], new[1], old[1])
    extra = None
    if new[2] is not None:
        extra = jnp.where(valid[:, None], new[2], old[2])
    return extr, intr, extra


def init_ba(extrinsics, intrinsics, extra_params, tracks, points_3d_pair,
            inlier_total, init_idx, image_size, cfg: SfmConfig):
    """BA over the query frame + best partner only.

    Parity: triangulation.py:138-257. All other frames' observations are
    masked out; their cameras are untouched (frozen by Jacobian masks).
    """
    S = extrinsics.shape[0]
    N = tracks.shape[1]

    init_points = points_3d_pair[init_idx]
    pair_inlier = inlier_total[init_idx]  # (N,)

    # pre-BA mismatch gate: the epipolar inlier mask is optional at the
    # run_sfm API, so pair_inlier can still carry gross mismatches. A
    # mismatched track's DLT point reprojects tens of px off in at least
    # one pair frame, while correct tracks share only the (systematic,
    # much smaller) error of the noisy initial relative pose — gate at
    # 3x the median pair error (floor 8 px) before letting BA see them.
    from vggsfm_tpu.geometry.cameras import project_points

    pair_frames = jnp.stack([extrinsics[0], extrinsics[init_idx + 1]])
    pair_intr = jnp.stack([intrinsics[0], intrinsics[init_idx + 1]])
    pair_obs = jnp.stack([tracks[0], tracks[init_idx + 1]])
    proj, pcam = project_points(init_points, pair_frames, pair_intr,
                                return_points_cam=True)
    err_pair = jnp.linalg.norm(proj - pair_obs, axis=-1)  # (2, N)
    err_pair = jnp.where(pcam[:, 2] > 0, err_pair, jnp.inf)
    err_max = jnp.max(err_pair, axis=0)
    med = jnp.nan_to_num(jnp.nanmedian(
        jnp.where(pair_inlier, err_max, jnp.nan)), nan=8.0)
    pair_inlier &= err_max <= jnp.maximum(3.0 * med, 8.0)

    obs_mask = jnp.zeros((S, N), bool)
    obs_mask = obs_mask.at[0].set(pair_inlier)
    obs_mask = obs_mask.at[init_idx + 1].set(pair_inlier)

    pose_free = jnp.zeros((S,), bool).at[init_idx + 1].set(True)
    intr_free = jnp.zeros((S,), bool).at[0].set(True).at[init_idx + 1].set(
        True)

    # Huber: when run_sfm is called without a fundamental-matrix inlier
    # mask, pair_inlier still contains gross mismatches; a trivial-loss
    # init BA lets them drag the pair geometry (and the focals) off, and
    # the strict init reprojection filter below then wipes out the cloud
    ba_cfg = dataclasses.replace(_ba_cfg(cfg), robust_loss="huber",
                                 loss_scale=3.0)
    extr_o, intr_o, extra_o, pts_o, _ = bundle_adjust(
        extrinsics, intrinsics, init_points, tracks, obs_mask,
        extra_params=extra_params, pose_free=pose_free, intr_free=intr_free,
        point_free=pair_inlier, cfg=ba_cfg)

    # keep only points that reproject well in the init pair
    reproj_ok, _ = filter_points3d(
        pts_o, tracks, extr_o, intr_o, extra_o,
        max_reproj_error=cfg.init_max_reproj_error, check_triangle=False,
        obs_mask=obs_mask)
    track_init_mask = pair_inlier & reproj_ok
    return extr_o, intr_o, extra_o, pts_o, track_init_mask


def triangulate_and_ba(extrinsics, intrinsics, extra_params, tracks, vis,
                       score, image_size, cfg: SfmConfig, seed: int = 0):
    """LORANSAC triangulation of every track + one global BA + filtering.

    Parity: triangulator.py:364-440 (`triangulate_tracks_and_BA`).
    Returns (points3d, extrinsics, intrinsics, extra, valid_tracks,
    inlier_mask (S, N)).
    """
    S, N = vis.shape
    tracks_norm = cam_from_img(tracks, intrinsics, extra_params)
    pts, inlier_num, inlier_mask_nt = triangulate_tracks(
        extrinsics, tracks_norm, track_vis=vis, track_score=score,
        max_ransac_iters=cfg.max_ransac_iters, seed=seed)
    inlier_mask = inlier_mask_nt.T  # (S, N)
    valid_tracks = inlier_num >= cfg.min_valid_track_length

    obs_mask = inlier_mask & valid_tracks[None]
    pose_free = jnp.arange(S) != 0
    extr_o, intr_o, extra_o, pts_o, _ = bundle_adjust(
        extrinsics, intrinsics, pts, tracks, obs_mask,
        extra_params=extra_params, pose_free=pose_free,
        point_free=valid_tracks, cfg=_ba_cfg(cfg))

    valid_frames = camera_validity_mask(intr_o, extr_o, image_size, extra_o)
    extr_o, intr_o, extra_o = _restore_invalid(
        (extr_o, intr_o, extra_o), (extrinsics, intrinsics, extra_params),
        valid_frames)

    reproj_ok, detail = filter_points3d(
        pts_o, tracks, extr_o, intr_o, extra_o,
        max_reproj_error=cfg.max_reproj_error, check_triangle=False,
        obs_mask=vis > cfg.vis_thresh, return_detail=True)
    valid_tracks &= reproj_ok
    return pts_o, extr_o, intr_o, extra_o, valid_tracks, detail


def iterative_global_ba(extrinsics, intrinsics, extra_params, tracks, vis,
                        score, points3d, valid_tracks, image_size,
                        max_reproj_error, cfg: SfmConfig, seed: int = 0):
    """Re-triangulate, filter, BA, re-filter — one round.

    Parity: triangulation.py:1076-1209. min track length 2 here (the
    reference's separate default).
    """
    S, N = vis.shape
    tracks_norm = cam_from_img(tracks, intrinsics, extra_params)
    pts, _, _ = triangulate_tracks(
        extrinsics, tracks_norm, track_vis=vis, track_score=score,
        max_ransac_iters=128, seed=seed)
    # keep BA-optimized positions for already-valid tracks
    pts = jnp.where(valid_tracks[:, None], points3d, pts)

    _, inlier_detail = filter_points3d(
        pts, tracks, extrinsics, intrinsics, extra_params,
        max_reproj_error=max_reproj_error, check_triangle=False,
        obs_mask=vis > cfg.vis_thresh, return_detail=True)
    valid_tracks = jnp.sum(inlier_detail, axis=0) >= 2

    obs_mask = inlier_detail & valid_tracks[None]
    pose_free = jnp.arange(S) != 0
    extr_o, intr_o, extra_o, pts_o, _ = bundle_adjust(
        extrinsics, intrinsics, pts, tracks, obs_mask,
        extra_params=extra_params, pose_free=pose_free,
        point_free=valid_tracks, cfg=_ba_cfg(cfg))

    valid_frames = camera_validity_mask(intr_o, extr_o, image_size, extra_o)
    extr_o, intr_o, extra_o = _restore_invalid(
        (extr_o, intr_o, extra_o), (extrinsics, intrinsics, extra_params),
        valid_frames)

    reproj_ok, detail = filter_points3d(
        pts_o, tracks, extr_o, intr_o, extra_o,
        max_reproj_error=max_reproj_error, check_triangle=False,
        obs_mask=vis > cfg.vis_thresh, return_detail=True)
    valid_tracks &= jnp.sum(detail, axis=0) >= 2
    return pts_o, extr_o, intr_o, extra_o, valid_tracks, detail


def run_sfm(extrinsics, intrinsics, tracks, vis, image_size,
            fmat_inlier_mask=None, score=None, extra_params=None,
            cfg: SfmConfig = SfmConfig()):
    """Full SfM solve from initial cameras + tracks.

    Args:
      extrinsics: (S, 3, 4) initial world->cam (camera predictor or
        preliminary two-view estimates).
      intrinsics: (S, 3, 3).
      tracks: (S, N, 2) pixel tracks, frame 0 = query.
      vis: (S, N) visibility in [0, 1].
      image_size: (width, height).
      fmat_inlier_mask: optional (S-1, N) epipolar inliers.
      score: optional (S, N) track confidence.

    Returns dict with refined cameras, points, masks.
    Parity: triangulator.py:44-350 (`Triangulator.forward`).
    """
    cfgb = cfg
    S, N, _ = tracks.shape
    if cfg.camera_type == "SIMPLE_RADIAL" and extra_params is None:
        extra_params = jnp.zeros((S, 1), tracks.dtype)

    tracks_norm = cam_from_img(tracks, intrinsics, extra_params)
    points_pair, cheirality_pair, tri_angle_pair = triangulate_by_pair(
        extrinsics, tracks_norm)

    inlier_vis = (vis > cfg.vis_thresh)[1:]
    if fmat_inlier_mask is not None:
        inlier_geo_vis = fmat_inlier_mask & inlier_vis
    else:
        inlier_geo_vis = inlier_vis

    inlier_total, init_idx = find_best_initial_pair(
        inlier_geo_vis, cheirality_pair, tri_angle_pair,
        cfg.init_tri_angle_thres)

    extr, intr, extra, pts_init, track_init_mask = init_ba(
        extrinsics, intrinsics, extra_params, tracks, points_pair,
        inlier_total, init_idx, image_size, cfgb)

    # refine all poses against the init cloud; force_estimate so frames
    # whose initialization is off (wrong two-view translation scale, bad
    # prediction) get PnP-registered against the cloud instead of LM-stuck.
    # Registration uses every *visible* observation of an init-cloud point
    # (not only epipolar inliers of the query pair — that gate starves
    # frames far from the query; RANSAC + robust LM absorb the outliers).
    obs = jnp.concatenate(
        [track_init_mask[None],
         (vis > cfg.vis_thresh)[1:] & track_init_mask[None]],
        axis=0)
    extr, intr, extra, _ = refine_poses(
        extr, intr, pts_init, tracks, obs, image_size, extra_params=extra,
        force_estimate=True, pnp_key=jax.random.PRNGKey(99),
        shared_intrinsics=cfg.shared_camera,
        refine_intrinsics=cfg.refine_focal)

    pts, extr, intr, extra, valid_tracks, inlier_detail = triangulate_and_ba(
        extr, intr, extra, tracks, vis, score, image_size, cfgb, seed=1)

    for refine_idx in range(cfg.robust_refine):
        obs = (vis > cfg.vis_thresh) & valid_tracks[None] & inlier_detail
        force = refine_idx == cfg.robust_refine - 1
        extr, intr, extra, _ = refine_poses(
            extr, intr, pts, tracks, obs, image_size, extra_params=extra,
            force_estimate=force,
            pnp_key=jax.random.PRNGKey(100 + refine_idx),
            shared_intrinsics=cfg.shared_camera,
            refine_intrinsics=cfg.refine_focal)
        pts, extr, intr, extra, valid_tracks, inlier_detail = \
            triangulate_and_ba(extr, intr, extra, tracks, vis, score,
                               image_size, cfgb, seed=2 + refine_idx)

    max_reproj = cfg.max_reproj_error
    for ba_iter in range(cfg.ba_iters):
        pts, extr, intr, extra, valid_tracks, inlier_detail = \
            iterative_global_ba(
                extr, intr, extra, tracks, vis, score, pts, valid_tracks,
                image_size, max_reproj, cfgb, seed=10 + ba_iter)
        max_reproj = max(max_reproj // 2, 1)

    valid_frames = camera_validity_mask(intr, extr, image_size, extra)
    valid_2d = inlier_detail & valid_tracks[None]

    return {
        "extrinsics": extr,
        "intrinsics": intr,
        "extra_params": extra,
        "points3d": pts,
        "valid_tracks": valid_tracks,
        "valid_2d_mask": valid_2d,
        "valid_frame_mask": valid_frames,
        "init_idx": init_idx,
    }
