"""Pose refinement against a fixed point cloud.

Parity: vggsfm/utils/triangulation.py:260-647 (`refine_pose` /
`init_refine_pose`), which loop per frame over `pycolmap.pose_refinement`.
With frozen 3D points the bundle's normal equations decouple per camera, so
one masked `bundle_adjust` call with all points frozen *is* the per-frame
refinement — batched, on device, no loop.

The reference's focal-validity fallback (re-estimating absolute pose by
RANSAC when focal leaves [0.1, 30] x scale; triangulation.py:384-433)
maps to: restore the pre-refinement camera wherever the refined parameters
leave the validity window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.ba import BAConfig, bundle_adjust
from vggsfm_tpu.geometry.cameras import project_points


def _frame_reproj_error(extrinsics, intrinsics, points3d, tracks, obs_mask,
                        clip_px: float = 12.0):
    """Per-frame mean clipped reprojection error (px) over obs_mask.

    Clipping bounds the influence of outlier observations so the score
    ranks pose candidates robustly.
    """
    proj, pcam = project_points(points3d, extrinsics, intrinsics,
                                return_points_cam=True)
    err = jnp.linalg.norm(proj - tracks, axis=-1)  # (S, N)
    err = jnp.where(pcam[:, 2] > 0, err, clip_px)  # behind camera = worst
    err = jnp.minimum(err, clip_px)
    w = obs_mask.astype(err.dtype)
    return jnp.sum(err * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1)


def camera_validity_mask(intrinsics, extrinsics, image_size,
                         extra_params=None):
    """Focal in [0.1, 30] * max(W, H), |t| <= 30, |extra| <= 1.

    Parity: triangulation.py:1222-1242 (`get_valid_frame_mask`).
    """
    scale = jnp.max(jnp.asarray(image_size, jnp.float32))
    f = intrinsics[:, 0, 0]
    ok = (f >= 0.1 * scale) & (f <= 30.0 * scale)
    ok &= jnp.all(jnp.abs(extrinsics[:, :, 3]) <= 30.0, axis=-1)
    if extra_params is not None:
        ok &= jnp.all(jnp.abs(extra_params) <= 1.0, axis=-1)
    return ok


def refine_poses(extrinsics, intrinsics, points3d, tracks, obs_mask,
                 image_size, extra_params=None, refine_intrinsics=True,
                 max_iterations: int = 20, force_estimate: bool = False,
                 pnp_key=None, shared_intrinsics: bool = False):
    """Refine every camera against the (frozen) 3D points.

    Args:
      extrinsics (S,3,4), intrinsics (S,3,3), points3d (N,3),
      tracks (S,N,2), obs_mask (S,N) — which observations constrain poses.

    Returns (extrinsics, intrinsics, extra_params, valid_frame_mask); frames
    whose refined parameters leave the validity window are restored to their
    inputs (and reported False in the mask).
    """
    S, N = obs_mask.shape
    # Huber loss is load-bearing here: obs_mask is only visibility-gated
    # (mismatched tracks included by design — the RANSAC/inlier filters run
    # later), and a trivial-loss LM lets a handful of large-error outliers
    # drag a near-perfect pose tens of degrees off. The reference's
    # pycolmap.pose_refinement is robust for the same reason.
    cfg = BAConfig(max_iterations=max_iterations,
                   refine_focal=refine_intrinsics,
                   refine_extra=refine_intrinsics and extra_params is not None,
                   shared_intrinsics=shared_intrinsics,
                   robust_loss="huber", loss_scale=3.0,
                   # all points frozen: per-camera decoupled normal
                   # equations, no point-Schur machinery (lm.py pose_only)
                   pose_only=True)
    extr_o, intr_o, extra_o, _, _ = bundle_adjust(
        extrinsics, intrinsics, points3d, tracks, obs_mask,
        extra_params=extra_params,
        pose_free=jnp.ones((S,), bool),
        intr_free=jnp.ones((S,), bool),
        point_free=jnp.zeros((points3d.shape[0],), bool),
        cfg=cfg)

    valid = camera_validity_mask(intr_o, extr_o, image_size, extra_o)
    # a 7-DoF camera refined against fewer than ~6 points is
    # underdetermined — LM can "perfectly fit" a wrong pose. Keep the
    # input camera for starved frames (and never PnP them either).
    n_obs = jnp.sum(obs_mask, axis=1)
    valid &= n_obs >= 6

    if force_estimate and pnp_key is not None:
        # absolute-pose re-estimation (parity: triangulation.py:384-433
        # pycolmap absolute_pose_estimation). Two regimes, deliberately
        # separated:
        #   1. pose-only competition at the frame's CURRENT focal — every
        #      frame is scored by robust reprojection error and the PnP
        #      pose wins where it fits the cloud better. This registers
        #      frames whose initialization had the wrong translation
        #      scale (two-view chained init) or a bad prediction.
        #   2. full re-estimation WITH the focal sweep only for frames
        #      whose camera left the validity window (the reference's
        #      gate). Letting the sweep compete on valid frames is a
        #      focal-drift engine: on weakly-constrained (near-planar)
        #      geometry a larger focal reprojects marginally better,
        #      wins the comparison, and BA then compounds it each round
        #      (observed 1.4x/round up to 12x on the oracle scene).
        from vggsfm_tpu.twoview.pnp import absolute_pose_ransac

        # cap the PnP problem size: pose estimation saturates statistically
        # long before 8k correspondences, and the RANSAC residual tensors
        # scale as S * f_trials * ransac_iters * N (a 32k-track problem
        # OOMed a 16 GB chip). A fixed random subset keeps shapes static.
        pnp_cap = 8192
        N_all = points3d.shape[0]
        if N_all > pnp_cap:
            sub = jax.random.permutation(
                jax.random.fold_in(pnp_key, 1), N_all)[:pnp_cap]
            points3d_p = points3d[sub]
            tracks_p = tracks[:, sub]
            obs_mask_p = obs_mask[:, sub]
        else:
            points3d_p, tracks_p, obs_mask_p = points3d, tracks, obs_mask

        pts_b = jnp.broadcast_to(points3d_p[None],
                                 (S,) + points3d_p.shape)
        err_lm = _frame_reproj_error(extr_o, intr_o, points3d, tracks,
                                     obs_mask)

        def _cheirality_frac(extr):
            z = (jnp.einsum("sj,nj->sn", extr[:, 2, :3], points3d)
                 + extr[:, 2, 3][:, None])
            w = obs_mask.astype(jnp.float32)
            return (jnp.sum((z > 0) * w, axis=1)
                    / jnp.maximum(jnp.sum(w, axis=1), 1.0))

        pnp = absolute_pose_ransac(pts_b, tracks_p, intrinsics, pnp_key,
                                   valid_mask=obs_mask_p, f_trials=1)
        pnp_valid = camera_validity_mask(
            pnp["intrinsics"], pnp["extrinsics"], image_size)
        # near-planar point sets admit a flipped PnP pose whose ROBUST
        # reprojection error can edge out the true one: only let PnP
        # displace an LM pose that is genuinely broken (err_lm above the
        # rescue threshold), and never adopt a pose that puts a chunk of
        # the cloud behind the camera
        rescue = 8.0
        pnp_valid &= _cheirality_frac(pnp["extrinsics"]) > 0.8
        pnp_valid &= n_obs >= 8
        err_pnp = _frame_reproj_error(pnp["extrinsics"], pnp["intrinsics"],
                                      points3d, tracks, obs_mask)
        use_pnp = pnp_valid & (((~valid))
                               | ((err_pnp < err_lm) & (err_lm > rescue)))
        extr_o = jnp.where(use_pnp[:, None, None], pnp["extrinsics"],
                           extr_o)
        intr_o = jnp.where(use_pnp[:, None, None], pnp["intrinsics"],
                           intr_o)
        valid |= use_pnp

        if not shared_intrinsics:
            # focal unknown only where the camera is still invalid — and
            # the whole 17-focal sweep runs UNDER lax.cond: at S x 17
            # focal trials the sweep's minimal DLT dominated refine_poses
            # (~700 ms on-chip, probe perf_probe_pnp.py) yet in a healthy
            # solve every frame is already valid and the result is
            # discarded. cond skips the branch at runtime for free.
            def _sweep(ops):
                extr_i, intr_i, valid_i = ops
                pnp_f = absolute_pose_ransac(
                    pts_b, tracks_p, intrinsics, pnp_key,
                    valid_mask=obs_mask_p, f_trials=17)
                pnp_f_valid = camera_validity_mask(
                    pnp_f["intrinsics"], pnp_f["extrinsics"], image_size)
                pnp_f_valid &= _cheirality_frac(pnp_f["extrinsics"]) > 0.8
                pnp_f_valid &= n_obs >= 8
                use_f = pnp_f_valid & ~valid_i
                extr_i = jnp.where(use_f[:, None, None],
                                   pnp_f["extrinsics"], extr_i)
                intr_i = jnp.where(use_f[:, None, None],
                                   pnp_f["intrinsics"], intr_i)
                return extr_i, intr_i, valid_i | use_f

            extr_o, intr_o, valid = jax.lax.cond(
                jnp.any(~valid), _sweep, lambda ops: ops,
                (extr_o, intr_o, valid))

    v3 = valid[:, None, None]
    extr_o = jnp.where(v3, extr_o, extrinsics)
    intr_o = jnp.where(v3, intr_o, intrinsics)
    if extra_params is not None:
        extra_o = jnp.where(valid[:, None], extra_o, extra_params)
    else:
        extra_o = None
    return extr_o, intr_o, extra_o, valid
