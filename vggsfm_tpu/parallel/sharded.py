"""Sharded end-to-end pipeline steps (GSPMD via jit + NamedSharding).

The full step covers the multi-chip story of SURVEY §2.3: feature CNN
sharded over ``frames``, tracker + LORANSAC triangulation + BA point
blocks sharded over ``points``; the reduced camera system of BA and the
space-attention virtual tokens reduce across the mesh with XLA-inserted
collectives. One `jax.jit` with input shardings — no hand-written
communication.
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
    """Build the jitted multi-chip step: images + queries -> tracks, points,
    refined cameras.

    Shardings: images (B, S, H, W, 3) over ``frames``; query points and all
    track-indexed arrays over ``points``; cameras replicated.
    """
    img_sh = shard_spec(mesh, None, "frames")
    qp_sh = shard_spec(mesh, None, "points")
    cam_sh = shard_spec(mesh)

    ransac_pairs = None  # computed per call (static shapes)

    def step(params, images, query_points, extrinsics, intrinsics, pairs):
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

        tr = tracks[0]
        vis0 = vis[0]
        tracks_norm = cam_from_img(tr, intrinsics, None)
        pts, inl_num, inl_mask = triangulate_tracks_chunk(
            extrinsics, jnp.swapaxes(tracks_norm, 0, 1), pairs,
            track_vis=vis0.T, max_ransac_iters=pairs.shape[0], lo_num=16)

        valid = inl_num >= 2
        obs_mask = inl_mask.T & valid[None]
        S = extrinsics.shape[0]
        extr_o, intr_o, _, pts_o, info = bundle_adjust(
            extrinsics, intrinsics, pts, tr, obs_mask,
            pose_free=jnp.arange(S) != 0, point_free=valid,
            cfg=BAConfig(max_iterations=10, refine_focal=False,
                         point_chunk=1 << 20))
        return tracks, vis, pts_o, extr_o, info["final_cost"]

    jitted = jax.jit(
        step,
        in_shardings=(None, img_sh, qp_sh, cam_sh, cam_sh, None),
    )

    def run(params, images, query_points, extrinsics, intrinsics,
            max_ransac_iters=8):
        S = images.shape[1]
        pairs = generate_ransac_pairs(S, max_ransac_iters, seed=0)
        return jitted(params, images, query_points, extrinsics, intrinsics,
                      pairs)

    return run


def sharded_pipeline_step(tracker, mesh):
    """Alias with the historical name used by __graft_entry__."""
    return sharded_track_and_reconstruct(tracker, mesh)
