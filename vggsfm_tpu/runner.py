"""VGGSfMRunner: the end-to-end sparse reconstruction orchestrator.

Parity: vggsfm/runners/runner.py (VGGSfMRunner.run -> sparse_reconstruct,
predict_tracks :1068-1198, comple_nonvis_frames :1201-1282, query-frame
selection). The host drives a sequence of jitted device stages:

  query-frame rank -> camera init -> feature maps -> multi-query tracking
  (chunked over points) -> non-visible-frame re-query -> two-view
  preliminary -> SfM solve (vggsfm_tpu.sfm) -> COLMAP export.

Everything device-side is fixed-shape; the runner pads query points to the
configured budget and threads validity masks.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.datasets.demo_loader import DemoLoader
from vggsfm_tpu.extractors import get_query_points
from vggsfm_tpu.geometry.cameras import pose_encoding_to_extri_intri
from vggsfm_tpu.io import arrays_to_reconstruction, write_model
from vggsfm_tpu.models import CameraPredictor, TrackerPredictor
from vggsfm_tpu.models.refine import refine_track
from vggsfm_tpu.models.sampling import sample_features4d
from vggsfm_tpu.geometry.cameras import cam_from_img
from vggsfm_tpu.ops.triangulation import triangulate_by_pair
from vggsfm_tpu.sfm import SfmConfig, run_sfm
from vggsfm_tpu.twoview import estimate_preliminary_cameras
from vggsfm_tpu.utils.cache import enable_compilation_cache
from vggsfm_tpu.utils import mfu


@contextlib.contextmanager
def _stage(timings: dict, name: str, annotate: bool):
    """Wall-clock a pipeline stage; add a profiler annotation when tracing.

    Timings are host wall-clock (includes dispatch; honest device time
    needs the captured trace — on a tunneled backend `block_until_ready`
    does not drain the dispatch queue, so only transfers tell the truth).
    """
    t0 = time.time()
    ctx = (jax.profiler.TraceAnnotation(name) if annotate
           else contextlib.nullcontext())
    with ctx:
        yield
    timings[name] = time.time() - t0


def _score_camera_init(extr, intr, tracks, vis, fmat_mask, focal_scale):
    """Init-pair support under a candidate camera set.

    Counts, for the best partner frame, the tracks that are epipolar
    inliers, cheirality-consistent, and well-conditioned (triangulation
    angle >= 2 deg) — the same quantities `find_best_initial_pair` ranks
    with. A failed camera prediction (wild focal / wrong geometry) scores
    near zero, letting the runner fall back to two-view initialization.

    The triangulation-angle criterion is not focal-fair: an implausibly
    SMALL focal widens the normalized ray fan, inflating apparent
    tri-angles, so an untrained camera head whose focal saturates the
    decoder's 0.2x/5x clamp (cameras.py pose_encoding_to_extri_intri)
    can outscore a sane two-view chain and then drag the whole BA focal
    solve off (observed: init f=0.2*scale -> BA f=2.27x GT, pairwise
    rotation drift 0.72 deg/frame). A focal at/near the clamp boundary
    is a saturated decode, never a real estimate — zero its score.
    """
    tracks_norm = cam_from_img(tracks, intr)
    _, cheir, tri = triangulate_by_pair(jnp.asarray(extr), tracks_norm)
    inl = fmat_mask & (vis > 0.05)[1:] & cheir & (tri >= 2.0)
    f = intr[..., 0, 0]
    saturated = jnp.any((f <= 0.21 * focal_scale)
                        | (f >= 4.9 * focal_scale))
    # -1 (not 0) so a saturated candidate loses even to a zero-support
    # competitor under the `s_n >= s_t` neural-preferring tie-break
    return jnp.where(saturated, -1, jnp.max(jnp.sum(inl, axis=-1)))


@dataclasses.dataclass
class RunnerConfig:
    """Mirrors cfgs/demo.yaml:6-67 flags that affect the sparse pipeline."""

    img_size: int = 1024
    query_frame_num: int = 3
    max_query_pts: int = 4096
    # 'auto': aliked when a trained checkpoint is available (the
    # reference default, cfgs/demo.yaml:49), else the measured-best
    # weights-free path (extractors/dispatch.py resolve_query_method)
    query_method: str = "auto"
    fine_tracking: bool = True
    coarse_iters: int = 6
    max_points_num: int = 163840  # track-frames per coarse tracker call
    # fine tracking holds (psize^2 x C) patch features per track-frame —
    # budgeted separately for 16 GB HBM (the reference reuses one constant
    # sized for 32-40 GB GPUs, runner.py:1079). The flat channel-first
    # fine pipeline (~7% spatial padding instead of the NHWC layouts' 4x)
    # fits 32768 track-frames per chunk: 4096-track calls at 8 frames,
    # measured faster than 2x2048 with half the dispatches
    # (tools/perf_probe_fine.py)
    max_fine_points_num: int = 32768
    comple_nonvis: bool = True
    min_vis_points: int = 500
    # ensemble camera predictions over the query orderings (reference
    # default avg_pose=True, cfgs/demo.yaml:40, utils/utils.py:25-127)
    avg_pose: bool = True
    # midpoint query ranking instead of DINO-similarity FPS (reference
    # query_by_midpoint, cfgs/demo.yaml:62; DINO is the default path)
    query_by_midpoint: bool = False
    # stride ranking 0, k, 2k, ... with k = S // query_num + 1 (reference
    # query_by_interval, runners/runner.py:347-349, utils/utils.py:253-262;
    # midpoint takes precedence when both are set, like the reference)
    query_by_interval: bool = False
    # re-anchor the sequence on the top-ranked query frame: swap it with
    # frame 0 for the whole solve, swap the outputs back (reference
    # center_order, cfgs/demo.yaml:15, runners/runner.py:359-386, :579-588)
    center_order: bool = False
    # save query-point overlays (OUT/visuals/query_points_*.png) for each
    # query frame (reference visual_query_points, cfgs/demo.yaml:58,
    # utils/utils.py:311-338)
    visual_query_points: bool = False
    profile_dir: str | None = None  # capture a JAX profiler trace here
    camera_type: str = "SIMPLE_PINHOLE"
    shared_camera: bool = False
    refine_focal: bool = True
    robust_refine: int = 2
    ba_iters: int = 2
    # epipolar (Sampson) inlier threshold for the preliminary two-view
    # fundamental estimation, in px (reference fmat_thres,
    # cfgs/demo.yaml:19, runners/runner.py:484). Matched to the
    # reference's 4.0 after a noise-swept A/B (tools/ab_gates.py,
    # ROADMAP "quality gates"): identical AUC on clean tracks, +0.09-0.12
    # AUC at 2 px noise / 30% outliers vs the round-3 0.5 px gate.
    fmat_thres: float = 4.0
    max_reproj_error: float = 4.0
    init_max_reproj_error: float = 4.0
    seed: int = 0
    checkpoint: str | None = None
    extract_color: bool = True
    # correlation-argmax track initialization (weights-free operating mode;
    # see models/tracker.py:global_match_coords). With converted reference
    # weights this can be disabled for exact reference-parity behavior.
    matching_init: bool = True
    # grid-point densification: one extra query point every N pixels,
    # tracked + triangulated without BA (reference extra_pt_pixel_interval
    # + concat_extra_points, cfgs/demo.yaml:65-66, runner.py:517-560).
    # <= 0 disables (the reference default).
    extra_pt_pixel_interval: int = -1
    # append the extra points (trackless) to the exported COLMAP model
    concat_extra_points: bool = False
    # track each frame's extra grid only into a window of this many
    # neighbor frames (reference extra_by_neighbor; <= 0 = all frames)
    extra_by_neighbor: int = -1
    # drop frames whose camera failed the validity window from the
    # exported model (reference filter_invalid_frame, cfgs/demo.yaml:18)
    filter_invalid_frame: bool = True
    # write track overlays (PNG per frame + GIF) to OUT/visuals
    # (reference visual_tracks, cfgs/demo.yaml:35)
    visual_tracks: bool = False
    # write reprojection overlays to OUT/visuals (reference
    # make_reproj_video: PNG frames + mp4 via cv2 VideoWriter)
    make_reproj_frames: bool = False
    # SfM camera initialization: 'neural' (camera predictor, the reference's
    # only mode), 'twoview' (chained essential-matrix poses from the
    # preliminary estimator), or 'hybrid' (score both by init-pair support
    # and pick the winner — robust to a failed neural prediction)
    camera_init: str = "hybrid"
    # dense monocular depth maps aligned to the sparse reconstruction
    # (reference dense_depth flag, runners/runner.py:133-162, 776-860)
    dense_depth: bool = False
    # DepthAnythingV2 checkpoint (depth_anything_v2_vit*.pth); random
    # ViT-B weights otherwise (machinery-complete, zero-egress env)
    depth_checkpoint: str | None = None
    # DPT inference resolution (the reference's infer_image resizes to
    # 518 on the long side, DepthAnythingV2 dpt.py input_size default)
    depth_input_size: int = 518
    # interactive 3D scene export: OUT/scene.glb with the point cloud +
    # camera frusta (reference gradio/GLB path, utils/gradio.py:50-233)
    make_glb: bool = False
    # 'bf16' runs the neural path in bfloat16 (parity with the reference's
    # fp16 autocast default, cfgs/demo.yaml:16); geometry stays f32
    precision: str = "bf16"
    # compile the WHOLE SfM solve (run_sfm) as one XLA program instead of
    # eager glue between jitted kernels — removes hundreds of dispatch
    # round-trips on a tunneled backend. On-chip A/B (tools/perf_probe.py
    # --probe sfm, 8 frames x 16k tracks, v5e): steady 2.81 s jitted vs
    # 3.21 s eager, and first-call 168 s vs 281 s (one program compiles
    # FASTER than the eager glue's many kernels). Default on.
    jit_sfm: bool = True
    # fused Pallas correlation kernel (TPU only; XLA fallback elsewhere)
    use_pallas_corr: bool | None = None


class VGGSfMRunner:
    def __init__(self, cfg: RunnerConfig = RunnerConfig()):
        self.cfg = cfg
        enable_compilation_cache()
        dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
        use_pallas = cfg.use_pallas_corr
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.tracker = TrackerPredictor(dtype=dtype,
                                        use_pallas_corr=use_pallas)
        self.camera = CameraPredictor(dtype=dtype)
        self._params = None
        self._weights_loaded = False
        self._jit_cache = {}
        self._depth = None  # (module, params), built lazily
        self._query_point_log = []  # (frame, qp, valid) per query extract

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------

    @property
    def params(self):
        if self._params is None:
            self._params = self._load_or_init_params()
        return self._params

    def _load_or_init_params(self):
        ckpt = self.cfg.checkpoint
        if ckpt and os.path.exists(ckpt):
            import torch

            from vggsfm_tpu.models.convert import convert_vggsfm_checkpoint

            sd = torch.load(ckpt, map_location="cpu")
            converted = convert_vggsfm_checkpoint(sd)
            self._weights_loaded = True
            return {"tracker": jax.tree.map(jnp.asarray,
                                            converted["tracker"]),
                    "camera": jax.tree.map(jnp.asarray,
                                           converted["camera"])}
        # random init (machinery-complete; weights convert when available)
        key = jax.random.PRNGKey(self.cfg.seed)
        im = jnp.zeros((1, 2, 128, 128, 3), jnp.float32)
        qp = jnp.full((1, 8, 2), 32.0, jnp.float32)
        tparams = jax.jit(
            lambda k, i, q: self.tracker.init(k, i, q, method="init_all")
        )(key, im, qp)
        cparams = jax.jit(lambda k, i: self.camera.init(k, i, iters=1))(
            key, jnp.zeros((1, 2, 336, 336, 3), jnp.float32))
        return {"tracker": tparams, "camera": cparams}

    # ------------------------------------------------------------------
    # jitted stages
    # ------------------------------------------------------------------

    def _jitted(self, name, fn):
        if name not in self._jit_cache:
            jitted = jax.jit(fn)

            def wrapper(*args, _name=name, _jitted=jitted, **kwargs):
                return mfu.timed_call(_name, _jitted, args, kwargs)

            self._jit_cache[name] = wrapper
        return self._jit_cache[name]

    def _fmaps(self, images):
        fn = self._jitted("fmaps", lambda p, im: self.tracker.apply(
            p, im, method="process_images_to_fmaps"))
        return fn(self.params["tracker"], images)

    def _coarse_track(self, fmaps, qp):
        minit = self.cfg.matching_init
        params = self.params["tracker"]  # resolve before reading the flag
        mvis = minit and not self._weights_loaded

        def fn(p, f, q):
            preds, vis = self.tracker.apply(
                p, q, f, self.cfg.coarse_iters, self.tracker.coarse_down_ratio,
                method=lambda m, qq, ff, iters, dr: m.coarse_predictor(
                    qq, ff, iters=iters, down_ratio=dr,
                    matching_init=minit, matching_vis=mvis))
            return preds[-1], vis
        return self._jitted("coarse", fn)(params, fmaps, qp)

    def _fine_track(self, images, coarse):
        minit = self.cfg.matching_init
        params = self.params["tracker"]
        # NCC polish only in the weights-free mode; a converted fine
        # tracker is already sub-pixel accurate
        subpix = minit and not self._weights_loaded

        def fn(p, im, tr):
            def fnet(x):
                # flat channel-first output — see ShallowEncoder
                return self.tracker.apply(p, x, True,
                                          method="apply_fine_fnet")

            def ftrack(q, f, iters, return_feat, matching_init,
                       fmaps_flat_hw=None):
                return self.tracker.apply(p, q, f, iters, return_feat,
                                          matching_init, fmaps_flat_hw,
                                          method="apply_fine_predictor")

            return refine_track(im, fnet, ftrack, tr, compute_score=True,
                                matching_init=minit,
                                subpixel_refine=subpix,
                                patch_dtype=self.tracker.dtype,
                                flat_fnet=True)
        return self._jitted("fine", fn)(params, images, coarse)

    def _camera_forward(self, images):
        fn = self._jitted("camera", lambda p, im: self.camera.apply(
            p, im, iters=4))
        return fn(self.params["camera"], images)

    def _query_points(self, image, key, method, max_pts, seg_mask=None):
        """get_query_points as ONE jitted program per (method, budget).

        The eager extractor tail (concat + permutation + valid-first
        sort) paid ~10 dispatch round-trips per query frame on the
        tunneled backend; jitting also routes it through the MFU ledger."""
        name = f"query_points_{method}_{max_pts}_{seg_mask is not None}"

        def fn(im, k, sm=None):
            return get_query_points(im, k, method, max_pts,
                                    seg_invalid_mask=sm)

        if seg_mask is not None:
            return self._jitted(name, fn)(image, key, seg_mask)
        return self._jitted(name, fn)(image, key)

    def _query_points_batched(self, images_q, keys, method, max_pts):
        """All query frames' keypoints in one vmapped jitted program.

        images_q (Q, H, W, 3), keys (Q, 2) -> (qp (Q, max_pts, 2),
        valid (Q, max_pts))."""
        name = f"query_points_batched_{method}_{max_pts}_{images_q.shape[0]}"

        def fn(ims, ks):
            return jax.vmap(
                lambda im, k: get_query_points(im, k, method, max_pts)
            )(ims, ks)

        return self._jitted(name, fn)(images_q, keys)

    def _load_depth_model(self):
        """Lazily build DepthAnything + params (converted checkpoint when
        available; random ViT-B otherwise). Parity: runner.py:133-162."""
        if self._depth is not None:
            return self._depth
        from vggsfm_tpu.models.dpt import DepthAnything

        dtype = (jnp.bfloat16 if self.cfg.precision == "bf16"
                 else jnp.float32)
        ckpt = self.cfg.depth_checkpoint
        if ckpt and os.path.exists(ckpt):
            import torch

            from vggsfm_tpu.models.convert import convert_depth_anything

            sd = torch.load(ckpt, map_location="cpu")
            params = convert_depth_anything(sd)
            depth = 1 + max(int(k.split(".")[2]) for k in sd
                            if k.startswith("pretrained.blocks."))
            model = (DepthAnything.vitl(dtype=dtype) if depth == 24
                     else DepthAnything(dtype=dtype))
            params = jax.tree.map(jnp.asarray, params)
        else:
            model = DepthAnything(dtype=dtype)
            r = self.cfg.depth_input_size
            params = jax.jit(model.init)(
                jax.random.PRNGKey(self.cfg.seed),
                jnp.zeros((1, min(r, 140), min(r, 140), 3), jnp.float32))
        self._depth = (model, params)
        return self._depth

    def _disparity(self, images):
        """(1, S, H, W, 3) -> (S, H, W) relative disparity, one frame per
        device step (DPT at `depth_input_size`, upsampled back)."""
        from vggsfm_tpu.models.sampling import interpolate_bilinear

        model, params = self._load_depth_model()
        r = self.cfg.depth_input_size
        H, W = images.shape[2:4]

        def fn(p, im):
            x = interpolate_bilinear(im, (r, r))
            d = model.apply(p, x)
            return interpolate_bilinear(d[..., None], (H, W))[..., 0]

        step = self._jitted("dpt", fn)
        # lax.map via per-frame host loop: keeps peak memory at one ViT
        # forward; frames are independent
        return jnp.concatenate(
            [step(params, images[0, s:s + 1])
             for s in range(images.shape[1])], axis=0)

    def dense_reconstruct(self, images, predictions):
        """Monocular disparity per frame, aligned to the sparse SfM depths.

        Adds ``depth_maps`` (S, H, W), per-frame alignment coefficients,
        and inlier fractions to `predictions`. Parity: runner.py:776-814
        (`dense_reconstruct`) with the sklearn RANSAC replaced by the
        in-graph fit (utils/depth.py).
        """
        from vggsfm_tpu.utils.depth import align_depth_maps_to_sfm

        disp = self._disparity(images)
        align = self._jitted("depth_align", align_depth_maps_to_sfm)
        obs = (jnp.asarray(predictions["valid_2d_mask"])
               & jnp.asarray(predictions["valid_tracks"])[None])
        depth_maps, a, b, inl = align(
            disp, jnp.asarray(predictions["extrinsics"]),
            jnp.asarray(predictions["points3d"]),
            jnp.asarray(predictions["pred_track"])[0], obs,
            jax.random.PRNGKey(self.cfg.seed + 7))
        predictions["depth_maps"] = np.asarray(depth_maps)
        predictions["depth_align_coeffs"] = np.stack(
            [np.asarray(a), np.asarray(b)], axis=-1)
        predictions["depth_inlier_frac"] = np.asarray(inl)
        return predictions

    def save_dense_depth_maps(self, depth_maps, image_names, output_dir,
                              crop_params=None):
        """Write COLMAP-format depth maps under ``output_dir/depths``,
        resampled to original image resolution when crop_params are given.
        Parity: runner.py:816-833."""
        from vggsfm_tpu.models.sampling import bilinear_sample
        from vggsfm_tpu.utils.depth import write_colmap_array

        depth_dir = os.path.join(output_dir, "depths")
        os.makedirs(depth_dir, exist_ok=True)
        S = depth_maps.shape[0]
        names = image_names or [f"image_{s:06d}" for s in range(S)]
        img_size = self.cfg.img_size
        for s in range(S):
            dmap = np.asarray(depth_maps[s], np.float32)
            if crop_params is not None:
                # inverse of the export rescale: original pixel (x, y)
                # lives at (x / ratio + left, y / ratio + top) in the
                # resized square the depth map covers
                real_w, real_h = (int(crop_params[s][0]),
                                  int(crop_params[s][1]))
                ratio = max(real_w, real_h) / float(img_size)
                top_left = np.abs(np.asarray(crop_params[s][4:6],
                                             np.float64))
                gx, gy = np.meshgrid(np.arange(real_w), np.arange(real_h))
                coords = jnp.asarray(np.stack(
                    [gx / ratio + top_left[0], gy / ratio + top_left[1]],
                    axis=-1)[None], jnp.float32)
                dmap = np.asarray(bilinear_sample(
                    jnp.asarray(dmap)[None, ..., None], coords,
                    padding_mode="border")[0, ..., 0])
            stem = os.path.splitext(os.path.basename(names[s]))[0]
            write_colmap_array(
                os.path.join(depth_dir, stem + ".bin"), dmap)

    def _frame_descriptors(self, images):
        fn = self._jitted("dino_desc", lambda p, im: self.camera.apply(
            p, im, method="frame_descriptors"))
        return fn(self.params["camera"], images)

    # ------------------------------------------------------------------
    # orchestration
    # ------------------------------------------------------------------

    def select_query_frames(self, images) -> list[int]:
        """Rank query frames: DINO-similarity farthest-point sampling by
        default, midpoint spread as the configured fallback.

        Parity: runners/runner.py:344-354 (generate_rank_by_dino /
        generate_rank_by_midpoint via cfg.query_by_midpoint).
        """
        from vggsfm_tpu.utils.camera_avg import (
            rank_by_dino_similarity,
            rank_by_interval,
            rank_by_midpoint,
        )

        S = images.shape[1]
        q = min(self.cfg.query_frame_num, S)
        if q <= 1 or S <= 2:
            return [0]
        if self.cfg.query_by_midpoint:
            return rank_by_midpoint(S, q)
        if self.cfg.query_by_interval:
            return rank_by_interval(S, S // q + 1)[:q]
        desc = self._frame_descriptors(images)
        return rank_by_dino_similarity(desc[0], q)[:q]

    def predict_tracks(self, images, fmaps, query_indices, masks=None,
                       query_method=None, max_query_pts=None):
        """Track from each query frame; concat over queries.

        Parity: runner.py:1068-1198 (frame-order swap + point chunking).
        `query_method` / `max_query_pts` override the config (used by the
        non-visible-frame escalation).
        """
        cfg = self.cfg
        query_method = query_method or cfg.query_method
        max_query_pts = max_query_pts or cfg.max_query_pts
        B, S = images.shape[:2]
        key = jax.random.PRNGKey(cfg.seed)

        # per-query keypoints (all the same static shape). Without
        # segmentation masks, ALL query frames detect in ONE vmapped
        # program — 8 separate per-frame calls cost 0.87 s of the
        # matched bench (8 x ~109 ms, each paying its own dispatch +
        # under-batched detector convs); the extractor stack is pure
        # functional jax, so vmap over (frames, keys) is free.
        qps, qp_valids, orders = [], [], []
        if masks is None and len(query_indices) > 1:
            subkeys = []
            for _ in query_indices:
                key, sub = jax.random.split(key)
                subkeys.append(sub)
            qp_b, qv_b = self._query_points_batched(
                images[0, np.asarray(query_indices)],
                jnp.stack(subkeys), query_method, max_query_pts)
            qps = list(qp_b)
            qp_valids = list(qv_b)
            for qframe in query_indices:
                order = np.arange(S)
                order[0], order[qframe] = qframe, 0
                orders.append(order)
            if self.cfg.visual_query_points:
                for i, qframe in enumerate(query_indices):
                    self._query_point_log.append(
                        (int(qframe), np.asarray(qps[i]),
                         np.asarray(qp_valids[i])))
        else:
            for qframe in query_indices:
                key, sub = jax.random.split(key)
                seg_mask = None
                if masks is not None:
                    seg_mask = jnp.asarray(masks[qframe] > 0.5)
                qp, qp_valid = self._query_points(
                    images[0, qframe], sub, query_method, max_query_pts,
                    seg_mask=seg_mask)
                if self.cfg.visual_query_points:
                    self._query_point_log.append(
                        (int(qframe), np.asarray(qp), np.asarray(qp_valid)))
                order = np.arange(S)
                order[0], order[qframe] = qframe, 0
                qps.append(qp)
                qp_valids.append(qp_valid)
                orders.append(order)
        orders = np.stack(orders)  # (Q, S)
        Q = orders.shape[0]

        # chunk points so each tracker call stays under its budget.
        # (Q-batching the coarse call was tried and measured 10x SLOWER
        # at the matched workload — 13.5 s per batched call vs 8 x 0.31 s:
        # the (Q, S, H, W, C) fmap gather + Q-wide pyramid/cmap working
        # set spills HBM. Per-query calls keep the footprint bounded.)
        chunk = max(256, cfg.max_points_num // S)
        # 4096-track cap: the old NHWC fine program OOMed the compiler
        # at 4096 windows (a 7.5 GB 4x-padded layout-copy temp); the
        # flat channel-first pipeline removed that tensor entirely and
        # 4096 now measures slightly faster than 2x2048 with half the
        # dispatches (tools/perf_probe_fine.py). Chunk count changes,
        # results don't.
        fine_chunk = max(128, min(4096, cfg.max_fine_points_num // S))

        inv_orders = np.argsort(orders, axis=1)
        all_track, all_vis, all_score = [], [], []
        for qi in range(Q):
            order = orders[qi]
            imgs_q = images[:, order]
            fmaps_q = fmaps[:, order]
            qp = qps[qi]
            tracks, viss, scores = [], [], []
            for start in range(0, qp.shape[0], chunk):
                qp_c = qp[None, start: start + chunk]
                coarse, vis = self._coarse_track(fmaps_q, qp_c)
                if cfg.fine_tracking:
                    fines, fscores = [], []
                    for fs in range(0, coarse.shape[2], fine_chunk):
                        f, sc = self._fine_track(
                            imgs_q, coarse[:, :, fs: fs + fine_chunk])
                        fines.append(f)
                        fscores.append(sc)
                    fine = jnp.concatenate(fines, axis=2)
                    score = jnp.concatenate(fscores, axis=2)
                else:
                    fine, score = coarse, jnp.ones_like(vis)
                tracks.append(fine)
                viss.append(vis)
                scores.append(score)
            track = jnp.concatenate(tracks, axis=2)[:, inv_orders[qi]]
            vis = jnp.concatenate(viss, axis=2)[:, inv_orders[qi]]
            score = jnp.concatenate(scores, axis=2)[:, inv_orders[qi]]
            # drop points whose extraction was invalid
            vis = vis * qp_valids[qi][None, None, :]
            all_track.append(track)
            all_vis.append(vis)
            all_score.append(score)

        return (jnp.concatenate(all_track, axis=2),
                jnp.concatenate(all_vis, axis=2),
                jnp.concatenate(all_score, axis=2))

    def sparse_reconstruct(self, images, masks=None, image_names=None,
                           output_dir=None, crop_params=None):
        """Full sparse pipeline on (S, R, R, 3) images in [0, 1].

        Returns a predictions dict (cameras, points, masks, timings).
        Parity: runner.py:292-633.
        """
        cfg = self.cfg
        t_start = time.time()
        # keep a host reference when the caller passed numpy — the
        # visualizers reuse it instead of re-downloading the frame stack
        host_images = images if isinstance(images, np.ndarray) else None
        # device placement: pass a jax array to keep frames resident
        # across calls (the video runner does); uint8 input uploads 4x
        # less and normalizes on device
        images = jnp.asarray(images)
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        images = images[None]  # (1, S, R, R, 3)
        B, S, H, W, _ = images.shape
        timings = {}
        self._query_point_log = []
        prof = cfg.profile_dir is not None
        if prof:
            try:
                # an exception mid-pipeline on a previous call leaves the
                # profiler active; clear it so one failed scene doesn't
                # make every later profiled run raise "already active"
                jax.profiler.stop_trace()
            except Exception:
                pass
            jax.profiler.start_trace(cfg.profile_dir)

        # 1. query frames (DINO-similarity FPS by default)
        with _stage(timings, "query_rank", prof):
            query_indices = self.select_query_frames(images)

        # 1b. center_order: anchor the solve on the top-ranked frame by
        # swapping it with frame 0 (a self-inverse permutation); per-frame
        # outputs are swapped back before returning (reference
        # runners/runner.py:359-386 + :579-588)
        center_perm = None
        if cfg.center_order and query_indices and query_indices[0] != 0:
            center = query_indices[0]
            center_perm = np.arange(S)
            center_perm[0], center_perm[center] = center, 0
            images = images[:, center_perm]
            if masks is not None:
                masks = np.asarray(masks)[center_perm]
            if host_images is not None:
                host_images = host_images[center_perm]
            if image_names is not None:
                image_names = [image_names[i] for i in center_perm]
            if crop_params is not None:
                crop_params = np.asarray(crop_params)[center_perm]
            query_indices = [center if x == 0 else (0 if x == center else x)
                             for x in query_indices]
            query_indices[0] = 0

        # 2. camera init — single resize to 336 inside the stage (the
        # reference resizes once too, camera_predictor.py:241-303);
        # ensembled over query orderings when avg_pose is on
        with _stage(timings, "camera_init", prof):
            if cfg.avg_pose:
                from vggsfm_tpu.utils.camera_avg import (
                    average_camera_prediction,
                )

                extr0, intr0 = average_camera_prediction(
                    lambda im: self._camera_forward(im)["pred_pose_enc"],
                    images, (H, W), query_indices=query_indices)
            else:
                pose_enc = self._camera_forward(images)["pred_pose_enc"]
                extr0, intr0 = pose_encoding_to_extri_intri(
                    pose_enc[0], (H, W))

        # 3. feature maps
        with _stage(timings, "fmaps", prof):
            fmaps = self._fmaps(images)

        # 4. tracking
        with _stage(timings, "tracking", prof):
            track, vis, score = self.predict_tracks(images, fmaps,
                                                    query_indices, masks)
            if cfg.comple_nonvis:
                track, vis, score = self._comple_nonvis(
                    images, fmaps, track, vis, score, masks)

        # 5. preliminary two-view geometry (through the MFU ledger so the
        # sync-timing bench attributes its device time to this stage
        # instead of the next recorded call)
        with _stage(timings, "preliminary", prof):
            pre = mfu.timed_call(
                "preliminary", estimate_preliminary_cameras,
                (track, vis, W, H, jax.random.PRNGKey(cfg.seed + 1)),
                dict(tracks_score=score if cfg.fine_tracking else None,
                     max_error=cfg.fmat_thres,
                     max_ransac_iters=1024, lo_num=128))

        # 5b. choose the SfM camera initialization (neural vs two-view)
        extr_init, intr_init = self._choose_camera_init(
            extr0, intr0, pre, track, vis)

        # 6. SfM solve
        with _stage(timings, "sfm", prof):
            sfm_cfg = SfmConfig(
                init_max_reproj_error=cfg.init_max_reproj_error,
                max_reproj_error=cfg.max_reproj_error,
                robust_refine=cfg.robust_refine,
                ba_iters=cfg.ba_iters,
                shared_camera=cfg.shared_camera,
                refine_focal=cfg.refine_focal,
                camera_type=cfg.camera_type)
            if cfg.jit_sfm:
                sfm_fn = self._jitted(
                    f"run_sfm_{hash((sfm_cfg, W, H))}",
                    partial(run_sfm, image_size=(W, H), cfg=sfm_cfg))
            else:
                sfm_fn = partial(run_sfm, image_size=(W, H), cfg=sfm_cfg)
            out = sfm_fn(extr_init, intr_init, track[0], vis[0],
                         fmat_inlier_mask=pre["fmat_inlier_mask"][0],
                         score=score[0])

        # 7. colors + export
        colors = None
        if cfg.extract_color:
            rgb = sample_features4d(images[0], track[0])  # S acts as batch
            w = (out["valid_2d_mask"]).astype(jnp.float32)[..., None]
            colors = (jnp.sum(rgb * w, axis=0)
                      / jnp.maximum(jnp.sum(w, axis=0), 1))
        # one batched device->host pull (per-array np.asarray costs a
        # ~30-50 ms round trip each on a tunneled backend)
        device_out = {
            **{k: v for k, v in out.items() if v is not None},
            "pred_track": track,
            "pred_vis": vis,
            "pred_score": score,
        }
        if colors is not None:
            device_out["colors"] = colors
        host_out = jax.device_get(device_out)
        if prof:
            # stop after the host pull: the transfer drains the dispatch
            # queue, so the trace ends with the true device timeline
            jax.profiler.stop_trace()
        predictions = {
            **{k: None for k, v in out.items() if v is None},
            "colors": None,
            **host_out,
            "timings": timings,
            "total_time": time.time() - t_start,
        }
        # gauge-normalize (reference: filter_reconstruction ->
        # reconstruction.normalize(5.0, 0.1, 0.9, True) after every
        # global BA, utils/triangulation.py:1052/1144/1199/1212-1218);
        # runs before extra points / dense depth so every downstream
        # consumer sees one coordinate frame
        from vggsfm_tpu.sfm.normalize import normalize_reconstruction

        # device_get hands back read-only arrays; normalization mutates
        predictions["extrinsics"] = np.array(predictions["extrinsics"])
        predictions["points3d"] = np.array(predictions["points3d"])
        normalize_reconstruction(
            predictions["extrinsics"], predictions["points3d"],
            registered=predictions.get("valid_frame_mask"))
        if cfg.extra_pt_pixel_interval > 0:
            # one grid point per interval^2 pixel cell (reference
            # runner.py:650-660 builds the same pixel-interval grid)
            with _stage(timings, "extra_points", prof):
                num_extra = max(1, (H // cfg.extra_pt_pixel_interval)
                                * (W // cfg.extra_pt_pixel_interval))
                predictions["additional_points"] = \
                    self.triangulate_extra_points(
                        images, fmaps, predictions["extrinsics"],
                        predictions["intrinsics"], num_extra=num_extra,
                        by_neighbor=cfg.extra_by_neighbor,
                        extra_params=predictions.get("extra_params"))
            predictions["total_time"] = time.time() - t_start
        if cfg.dense_depth:
            t0 = time.time()
            self.dense_reconstruct(images, predictions)
            timings["dense_depth"] = time.time() - t0
            predictions["total_time"] = time.time() - t_start
        if output_dir is not None:
            self.save_reconstruction(predictions, (W, H), image_names,
                                     output_dir, crop_params=crop_params)
            if cfg.dense_depth:
                self.save_dense_depth_maps(
                    predictions["depth_maps"], image_names, output_dir,
                    crop_params=crop_params)
            if cfg.make_glb:
                from vggsfm_tpu.io.glb import reconstruction_to_glb

                reconstruction_to_glb(
                    predictions, os.path.join(output_dir, "scene.glb"),
                    image_size=(W, H))
            if cfg.visual_query_points and self._query_point_log:
                from vggsfm_tpu.utils.visualizer import (
                    visualize_query_points,
                )

                qimgs = (host_images if host_images is not None
                         else np.asarray(images[0]))
                vdir = os.path.join(output_dir, "visuals")
                for qi, (qframe, qp, qvalid) in enumerate(
                        self._query_point_log):
                    visualize_query_points(
                        qimgs[qframe], qp,
                        os.path.join(vdir,
                                     f"query_points_{qi:02d}_f{qframe:04d}"
                                     ".png"),
                        valid=qvalid > 0.5)
            if cfg.visual_tracks or cfg.make_reproj_frames:
                from vggsfm_tpu.utils.visualizer import (
                    visualize_reprojections,
                    visualize_tracks,
                )

                imgs_np = (host_images if host_images is not None
                           else np.asarray(images[0]))
                vdir = os.path.join(output_dir, "visuals")
                if cfg.visual_tracks:
                    visualize_tracks(imgs_np, predictions["pred_track"][0],
                                     predictions["pred_vis"][0], vdir)
                if cfg.make_reproj_frames:
                    visualize_reprojections(
                        imgs_np, predictions["pred_track"][0],
                        predictions["points3d"],
                        predictions["extrinsics"],
                        predictions["intrinsics"],
                        predictions["valid_tracks"], vdir,
                        extra_params=predictions.get("extra_params"))
        if center_perm is not None:
            # swap per-frame outputs back to the caller's frame order (the
            # permutation is self-inverse); the exported model already used
            # the permuted image names consistently (reference
            # runners/runner.py:579-588)
            for k in ("extrinsics", "intrinsics", "extra_params",
                      "valid_frame_mask", "valid_2d_mask", "depth_maps",
                      "depth_align_coeffs", "depth_inlier_frac"):
                if predictions.get(k) is not None:
                    predictions[k] = np.asarray(predictions[k])[center_perm]
            for k in ("pred_track", "pred_vis", "pred_score"):
                if predictions.get(k) is not None:
                    predictions[k] = np.asarray(
                        predictions[k])[:, center_perm]
            predictions["center_perm"] = center_perm
        return predictions

    def _choose_camera_init(self, extr_neural, intr_neural, pre, track,
                            vis):
        """Pick SfM initial cameras per `cfg.camera_init`.

        'hybrid' scores the neural prediction against the two-view chained
        poses by init-pair support and keeps the winner. The reference has
        no such fallback — a bad camera prediction poisons its whole solve
        (triangulator.py:126-160 trusts pred_cameras unconditionally).
        """
        cfg = self.cfg
        if cfg.camera_init == "neural":
            return extr_neural, intr_neural
        S = track.shape[1]
        extr_tv = pre["extrinsics"][0]
        intr_tv = jnp.broadcast_to(pre["default_intri"], (S, 3, 3))
        if cfg.camera_init == "twoview":
            return extr_tv, intr_tv
        if cfg.camera_init != "hybrid":
            raise ValueError(f"unknown camera_init {cfg.camera_init}")
        # score both candidates and select IN-GRAPH: no host round-trip,
        # and the winner flows straight into run_sfm's dispatch queue
        def _select(extr_n, intr_n, extr_t, intr_t, tr, vi, fm):
            # the two-view default focal max(W,H) is the decode scale the
            # neural head's 0.2x/5x clamp is expressed in
            scale = intr_t[0, 0, 0]
            s_n = _score_camera_init(extr_n, intr_n, tr, vi, fm, scale)
            s_t = _score_camera_init(extr_t, intr_t, tr, vi, fm, scale)
            c = s_n >= s_t
            return (jnp.where(c, extr_n, extr_t),
                    jnp.where(c, intr_n, intr_t))

        return self._jitted("caminit_select", _select)(
            extr_neural, intr_neural, extr_tv, intr_tv, track[0], vis[0],
            pre["fmat_inlier_mask"][0])

    def _comple_nonvis(self, images, fmaps, track, vis, score, masks):
        """Re-query frames with too few visible points, then escalate.

        Parity: runner.py:1201-1282 (`comple_nonvis_frames`): loop querying
        from the first non-visible frame; when the same frame stays
        non-visible, one final trial re-queries *all* remaining bad frames
        with the combined extractor set at half the point budget, then
        stops.
        """
        cfg = self.cfg

        def bad_frames(v):
            count = np.asarray(jnp.sum(v[0] > 0.05, axis=-1))
            return [int(i) for i in np.nonzero(
                count < cfg.min_vis_points)[0]]

        bad = bad_frames(vis)
        last_query = -1
        final_trial = False
        while bad:
            if bad[0] == last_query:
                final_trial = True
                method = "sp+sift+aliked"
                max_pts = cfg.max_query_pts // 2
                query_list = bad
            else:
                method = cfg.query_method
                max_pts = cfg.max_query_pts
                query_list = [bad[0]]
            last_query = bad[0]

            t2, v2, s2 = self.predict_tracks(
                images, fmaps, query_list, masks,
                query_method=method, max_query_pts=max_pts)
            track = jnp.concatenate([track, t2], axis=2)
            vis = jnp.concatenate([vis, v2], axis=2)
            score = jnp.concatenate([score, s2], axis=2)
            bad = bad_frames(vis)
            if final_trial:
                break
        return track, vis, score

    def triangulate_extra_points(self, images, fmaps, extrinsics,
                                 intrinsics, num_extra: int = 4096,
                                 by_neighbor: int = -1,
                                 extra_params=None):
        """Densify: per-frame grid points tracked + triangulated, no BA.

        Parity: runner.py:635-742 (`triangulate_extra_points`): every
        frame queries its own pixel grid, tracked over a neighbor window
        of `by_neighbor` frames (`sample_subrange`; <= 0 = all frames),
        then LORANSAC-triangulated against the refined cameras. The
        window length is fixed per call so the tracker compiles once.

        Returns dict with ``points3d (S*N, 3)``, ``valid (S*N,)``,
        ``colors (S*N, 3)``, ``query_frame (S*N,)``.
        """
        from vggsfm_tpu.extractors.dispatch import grid_keypoints
        from vggsfm_tpu.geometry.cameras import cam_from_img
        from vggsfm_tpu.ops.triangulation import triangulate_tracks

        B, S, H, W, _ = images.shape
        extrinsics = np.asarray(extrinsics)
        intrinsics = np.asarray(intrinsics)
        qp = grid_keypoints(H, W, num_extra)[None]
        chunk = max(256, self.cfg.max_points_num // S)
        L = S if by_neighbor <= 0 else max(2, min(S, by_neighbor))

        all_pts, all_valid, all_rgb, all_src = [], [], [], []
        for q in range(S):
            n0 = 0 if L == S else int(np.clip(q - L // 2, 0, S - L))
            order = np.arange(n0, n0 + L)
            rel_q = q - n0
            order[0], order[rel_q] = order[rel_q], order[0]
            fmaps_q = fmaps[:, order]

            tr_all, vis_all = [], []
            for start in range(0, qp.shape[1], chunk):
                t, v = self._coarse_track(fmaps_q,
                                          qp[:, start: start + chunk])
                tr_all.append(t)
                vis_all.append(v)
            tr = jnp.concatenate(tr_all, axis=2)[0]  # (L, N, 2)
            vi = jnp.concatenate(vis_all, axis=2)[0]

            intr_w = jnp.asarray(intrinsics[order])
            extra_w = (None if extra_params is None
                       else jnp.asarray(np.asarray(extra_params)[order]))
            tn = cam_from_img(tr, intr_w, extra_w)
            pts, inl_num, _ = triangulate_tracks(
                jnp.asarray(extrinsics[order]), tn, track_vis=vi,
                max_ransac_iters=64, seed=7 + q)
            colors = sample_features4d(images[0, order], tr)
            w = (vi > 0.05).astype(jnp.float32)[..., None]
            rgb = jnp.sum(colors * w, axis=0) / jnp.maximum(
                jnp.sum(w, axis=0), 1)
            all_pts.append(np.asarray(pts))
            # a 2-frame neighbor window can never reach 3 inliers —
            # require what the window can actually support
            all_valid.append(np.asarray(inl_num >= min(3, L)))
            all_rgb.append(np.asarray(rgb))
            all_src.append(np.full(qp.shape[1], q, np.int32))

        return {"points3d": np.concatenate(all_pts),
                "valid": np.concatenate(all_valid),
                "colors": np.concatenate(all_rgb),
                "query_frame": np.concatenate(all_src)}

    def save_reconstruction(self, predictions, image_size, image_names,
                            output_dir, crop_params=None):
        """Write COLMAP sparse model, in original image coordinates when
        crop_params are given. Parity: runner.py:887-911 + :1009-1052."""
        valid = predictions["valid_tracks"]
        obs = predictions["valid_2d_mask"] & valid[None]
        valid_frames = predictions.get("valid_frame_mask")
        if self.cfg.filter_invalid_frame and valid_frames is not None:
            # drop invalid frames' observations so no point track
            # references a frame about to be deregistered (parity:
            # runner.py:565-575 reconstruction.deregister_image)
            obs = obs & np.asarray(valid_frames)[:, None]
        colors = predictions["colors"]
        rec = arrays_to_reconstruction(
            predictions["points3d"],
            predictions["extrinsics"],
            predictions["intrinsics"],
            predictions["pred_track"][0],
            obs,
            image_size,
            extra_params=predictions["extra_params"],
            shared_camera=self.cfg.shared_camera,
            camera_type=self.cfg.camera_type,
            image_names=image_names,
            colors=(None if colors is None
                    else np.clip(colors * 255, 0, 255).astype(np.uint8)),
        )
        if self.cfg.filter_invalid_frame and valid_frames is not None:
            for s in np.nonzero(~np.asarray(valid_frames))[0]:
                rec.images.pop(int(s) + 1, None)
        extra = predictions.get("additional_points")
        if extra is not None:
            # persist the densified grid points (reference saves
            # additional_points_dict.pt, runner.py:244-247; npz here)
            os.makedirs(output_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(output_dir, "additional_points.npz"),
                points3d=extra["points3d"][extra["valid"]],
                colors=extra["colors"][extra["valid"]],
                sfm_points_num=int(valid.sum()),
                additional_points_num=int(extra["valid"].sum()))
            if self.cfg.concat_extra_points:
                # trackless points appended to the model (reference
                # add_point3D with an empty Track, runner.py:549-560)
                from vggsfm_tpu.io.colmap import Point3D

                next_id = (max(rec.points3D) + 1) if rec.points3D else 1
                rgb255 = np.clip(extra["colors"] * 255, 0,
                                 255).astype(np.uint8)
                for xyz, rgb, ok in zip(extra["points3d"], rgb255,
                                        extra["valid"]):
                    if not ok:
                        continue
                    rec.points3D[next_id] = Point3D(
                        id=next_id, xyz=np.asarray(xyz, np.float64),
                        rgb=rgb, error=0.0,
                        image_ids=np.zeros((0,), np.int32),
                        point2D_idxs=np.zeros((0,), np.int32))
                    next_id += 1
        if crop_params is not None:
            from vggsfm_tpu.io.bridge import (
                rescale_reconstruction_to_original,
            )

            rec = rescale_reconstruction_to_original(
                rec, crop_params, self.cfg.img_size,
                image_names=image_names,
                shared_camera=self.cfg.shared_camera)
        write_model(rec, os.path.join(output_dir, "sparse"), ext=".bin")
        return rec

    def run_scene(self, scene_dir: str, output_dir: str | None = None,
                  load_gt: bool = False):
        """Convenience: load a scene folder and reconstruct it.

        With `load_gt`, a COLMAP model under SCENE/sparse[/0] is loaded
        and the predictions dict gains ``gt_auc30`` — the reference's
        load_gt evaluation path (cfgs/demo.yaml:30, demo_loader.py:116).
        """
        loader = DemoLoader(scene_dir, img_size=self.cfg.img_size,
                            load_gt=load_gt)
        data = loader.load()
        predictions = self.sparse_reconstruct(
            data["images"], masks=data["masks"],
            image_names=data["image_names"],
            output_dir=output_dir,
            crop_params=data["crop_params"])
        gt = data.get("gt")
        if load_gt and gt is not None:
            from vggsfm_tpu.geometry.metrics import pose_auc30

            # align by image NAME: COLMAP assigns image ids in
            # registration order, not filename order, and may register
            # only a subset — positional pairing would silently score
            # mismatched frames. (No global alignment needed: the metric
            # is built on relative pose pairs.)
            gt_by_name = {n: i for i, n in enumerate(gt["image_names"])}
            pred_idx, gt_idx = [], []
            for i, n in enumerate(data["image_names"]):
                j = gt_by_name.get(n)
                if j is not None:
                    pred_idx.append(i)
                    gt_idx.append(j)
            if len(pred_idx) >= 2:
                predictions["gt_auc30"] = float(np.asarray(pose_auc30(
                    jnp.asarray(predictions["extrinsics"][pred_idx]),
                    jnp.asarray(gt["extrinsics"][gt_idx], jnp.float32))))
                predictions["gt_frames_matched"] = len(pred_idx)
        return predictions
