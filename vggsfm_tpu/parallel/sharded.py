"""Sharded end-to-end pipeline steps (GSPMD via jit + NamedSharding).

The full step covers the multi-chip story of SURVEY §2.3 as ONE XLA
program: Harris query extraction on the query frame, feature CNN sharded
over ``frames``, coarse+fine tracker + preliminary two-view estimation
(LORANSAC fundamental -> chained essential cameras) + LORANSAC
triangulation + BA point blocks sharded over ``points``; the reduced
camera system of BA and the space-attention virtual tokens reduce across
the mesh with XLA-inserted collectives. One `jax.jit` with input
shardings — no hand-written communication.

Host-side orchestration that the production runner adds on top (the
comple_nonvis re-query loop, track chunking, camera-init competition,
iterative refine/BA rounds) is deliberately outside this step: those are
Python loops around repeated invocations of exactly these sharded
computations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vggsfm_tpu.ba import BAConfig, bundle_adjust
from vggsfm_tpu.geometry.cameras import cam_from_img
from vggsfm_tpu.ops.triangulation import (
    generate_ransac_pairs,
    triangulate_tracks_chunk,
)
from vggsfm_tpu.parallel.mesh import shard_spec


def sharded_track_and_reconstruct(tracker, mesh):
    """Build the jitted multi-chip step: images -> query points, tracks,
    3D points, cameras (initialized in-graph from two-view geometry when
    none are given).

    Shardings: images (B, S, H, W, 3) over ``frames``; query points and
    all track-indexed arrays over ``points``; cameras replicated.
    """
    from vggsfm_tpu.extractors.corners import detect_harris_keypoints
    from vggsfm_tpu.twoview import estimate_preliminary_cameras

    img_sh = shard_spec(mesh, None, "frames")
    qp_sh = shard_spec(mesh, None, "points")
    cam_sh = shard_spec(mesh)

    def step(params, images, query_points, extrinsics, intrinsics, pairs,
             key):
        from vggsfm_tpu.models.refine import refine_track

        fmaps = tracker.apply(params, images,
                              method="process_images_to_fmaps")
        coord_preds, vis = tracker.apply(
            params, query_points, fmaps, 6, 2,
            method=lambda m, q, f, iters, dr: m.coarse_predictor(
                q, f, iters=iters, down_ratio=dr,
                matching_init=True, matching_vis=True))
        coarse = coord_preds[-1]  # (B, S, N, 2)

        # fine refinement: patch features + fine former + NCC polish, all
        # sharded over `points` (each track's 31x31 patch pipeline is
        # independent) — the dryrun covers the production fine path, not
        # a coarse-only simplification
        def fnet(x):
            return tracker.apply(params, x, method="apply_fine_fnet")

        def ftrack(q, f, iters, return_feat, matching_init):
            return tracker.apply(params, q, f, iters, return_feat,
                                 matching_init,
                                 method="apply_fine_predictor")

        tracks, _score = refine_track(images, fnet, ftrack, coarse,
                                      compute_score=True,
                                      matching_init=True,
                                      subpixel_refine=True)

        # preliminary two-view geometry (production step 5): epipolar
        # inlier masks gate triangulation, chained essential-matrix
        # cameras initialize BA when the caller passed none
        H, W = images.shape[2], images.shape[3]
        pre = estimate_preliminary_cameras(
            tracks, vis, W, H, key, max_ransac_iters=128, lo_num=16)
        S = images.shape[1]
        if extrinsics is None:
            extrinsics = pre["extrinsics"][0]
            intrinsics = jnp.broadcast_to(pre["default_intri"], (S, 3, 3))

        tr = tracks[0]
        vis0 = vis[0]
        fmask = jnp.concatenate(
            [jnp.ones_like(pre["fmat_inlier_mask"][:, :1]),
             pre["fmat_inlier_mask"]], axis=1)[0]  # (S, N)
        tracks_norm = cam_from_img(tr, intrinsics, None)
        pts, inl_num, inl_mask = triangulate_tracks_chunk(
            extrinsics, jnp.swapaxes(tracks_norm, 0, 1), pairs,
            track_vis=(vis0 * fmask).T, max_ransac_iters=pairs.shape[0],
            lo_num=16)

        valid = inl_num >= 2
        obs_mask = inl_mask.T & valid[None]
        extr_o, intr_o, _, pts_o, info = bundle_adjust(
            extrinsics, intrinsics, pts, tr, obs_mask,
            pose_free=jnp.arange(S) != 0, point_free=valid,
            cfg=BAConfig(max_iterations=10, refine_focal=True,
                         point_chunk=1 << 20))
        return tracks, vis, pts_o, extr_o, info["final_cost"]

    jitted = jax.jit(
        step,
        in_shardings=(None, img_sh, qp_sh, cam_sh, cam_sh, None, None),
        static_argnames=(),
    )

    def extract_queries(images, max_query_pts):
        """Harris query extraction on the query frame (production step
        `get_query_points`, method='harris'), jitted separately only
        because its top-k output feeds the step's static N."""
        gray = (0.299 * images[0, 0, ..., 0]
                + 0.587 * images[0, 0, ..., 1]
                + 0.114 * images[0, 0, ..., 2])
        xy, _score, valid = detect_harris_keypoints(gray, max_query_pts)
        return xy[None], valid[None]

    def run(params, images, query_points=None, extrinsics=None,
            intrinsics=None, max_ransac_iters=8, max_query_pts=None):
        S = images.shape[1]
        if query_points is None:
            query_points, _ = extract_queries(images, max_query_pts or 64)
        pairs = generate_ransac_pairs(S, max_ransac_iters, seed=0)
        return jitted(params, images, query_points, extrinsics,
                      intrinsics, pairs, jax.random.PRNGKey(0))

    return run


def sharded_pipeline_step(tracker, mesh):
    """Alias with the historical name used by __graft_entry__."""
    return sharded_track_and_reconstruct(tracker, mesh)
