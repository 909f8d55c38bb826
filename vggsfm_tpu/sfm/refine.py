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
    cfg = BAConfig(max_iterations=max_iterations,
                   refine_focal=refine_intrinsics,
                   refine_extra=refine_intrinsics and extra_params is not None,
                   shared_intrinsics=shared_intrinsics)
    extr_o, intr_o, extra_o, _, _ = bundle_adjust(
        extrinsics, intrinsics, points3d, tracks, obs_mask,
        extra_params=extra_params,
        pose_free=jnp.ones((S,), bool),
        intr_free=jnp.ones((S,), bool),
        point_free=jnp.zeros((points3d.shape[0],), bool),
        cfg=cfg)

    valid = camera_validity_mask(intr_o, extr_o, image_size, extra_o)

    if force_estimate and pnp_key is not None:
        # absolute-pose re-estimation (parity: triangulation.py:384-433
        # pycolmap absolute_pose_estimation). The reference only re-poses
        # frames whose focal left the validity window; here every frame is
        # also scored by robust reprojection error and the PnP pose wins
        # wherever it fits the cloud better — this is what registers
        # frames whose initialization had the wrong translation scale
        # (two-view chained init) or was simply bad (failed prediction).
        from vggsfm_tpu.twoview.pnp import absolute_pose_ransac

        # with shared intrinsics the focal is already estimated jointly —
        # a per-frame focal sweep would fight the shared-camera constraint
        pnp = absolute_pose_ransac(
            jnp.broadcast_to(points3d[None], (S,) + points3d.shape),
            tracks, intrinsics, pnp_key, valid_mask=obs_mask,
            f_trials=1 if shared_intrinsics else 17)
        pnp_valid = camera_validity_mask(
            pnp["intrinsics"], pnp["extrinsics"], image_size)
        err_lm = _frame_reproj_error(extr_o, intr_o, points3d, tracks,
                                     obs_mask)
        err_pnp = _frame_reproj_error(pnp["extrinsics"], pnp["intrinsics"],
                                      points3d, tracks, obs_mask)
        use_pnp = pnp_valid & (((~valid)) | (err_pnp < err_lm))
        extr_o = jnp.where(use_pnp[:, None, None], pnp["extrinsics"],
                           extr_o)
        intr_o = jnp.where(use_pnp[:, None, None], pnp["intrinsics"],
                           intr_o)
        valid |= use_pnp

    v3 = valid[:, None, None]
    extr_o = jnp.where(v3, extr_o, extrinsics)
    intr_o = jnp.where(v3, intr_o, intrinsics)
    if extra_params is not None:
        extra_o = jnp.where(valid[:, None], extra_o, extra_params)
    else:
        extra_o = None
    return extr_o, intr_o, extra_o, valid
