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

import dataclasses
import os
import time

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
from vggsfm_tpu.sfm import SfmConfig, run_sfm
from vggsfm_tpu.twoview import estimate_preliminary_cameras
from vggsfm_tpu.utils.cache import enable_compilation_cache


@dataclasses.dataclass
class RunnerConfig:
    """Mirrors cfgs/demo.yaml:6-67 flags that affect the sparse pipeline."""

    img_size: int = 1024
    query_frame_num: int = 3
    max_query_pts: int = 4096
    query_method: str = "sift"
    fine_tracking: bool = True
    coarse_iters: int = 6
    max_points_num: int = 163840  # track-frames per coarse tracker call
    # fine tracking holds (psize^2 x C) patch features per track-frame —
    # budgeted separately for 16 GB HBM (the reference reuses one constant
    # sized for 32-40 GB GPUs, runner.py:1079)
    max_fine_points_num: int = 8192
    comple_nonvis: bool = True
    min_vis_points: int = 500
    camera_type: str = "SIMPLE_PINHOLE"
    shared_camera: bool = False
    robust_refine: int = 2
    ba_iters: int = 2
    max_reproj_error: float = 4.0
    init_max_reproj_error: float = 0.5
    seed: int = 0
    checkpoint: str | None = None
    extract_color: bool = True
    # 'bf16' runs the neural path in bfloat16 (parity with the reference's
    # fp16 autocast default, cfgs/demo.yaml:16); geometry stays f32
    precision: str = "bf16"
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
        self._jit_cache = {}

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

    def _stage(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    def _fmaps(self, images):
        fn = self._stage("fmaps", lambda p, im: self.tracker.apply(
            p, im, method="process_images_to_fmaps"))
        return fn(self.params["tracker"], images)

    def _coarse_track(self, fmaps, qp):
        def fn(p, f, q):
            preds, vis = self.tracker.apply(
                p, q, f, self.cfg.coarse_iters, self.tracker.coarse_down_ratio,
                method=lambda m, qq, ff, iters, dr: m.coarse_predictor(
                    qq, ff, iters=iters, down_ratio=dr))
            return preds[-1], vis
        return self._stage("coarse", fn)(self.params["tracker"], fmaps, qp)

    def _fine_track(self, images, coarse):
        def fn(p, im, tr):
            def fnet(x):
                return self.tracker.apply(p, x, method="apply_fine_fnet")

            def ftrack(q, f, iters, return_feat):
                return self.tracker.apply(p, q, f, iters, return_feat,
                                          method="apply_fine_predictor")

            return refine_track(im, fnet, ftrack, tr, compute_score=True)
        return self._stage("fine", fn)(self.params["tracker"], images,
                                       coarse)

    def _camera_forward(self, images):
        fn = self._stage("camera", lambda p, im: self.camera.apply(
            p, im, iters=4))
        return fn(self.params["camera"], images)

    # ------------------------------------------------------------------
    # orchestration
    # ------------------------------------------------------------------

    def select_query_frames(self, num_frames: int) -> list[int]:
        """Uniformly spread query frames (the reference's 'midpoint'
        strategy, utils/utils.py:234-262; DINO-similarity FPS later)."""
        q = min(self.cfg.query_frame_num, num_frames)
        if q <= 1:
            return [0]
        idx = np.linspace(0, num_frames - 1, q).round().astype(int)
        return sorted(set(int(i) for i in idx))

    def predict_tracks(self, images, fmaps, query_indices, masks=None):
        """Track from each query frame; concat over queries.

        Parity: runner.py:1068-1198 (frame-order swap + point chunking).
        """
        cfg = self.cfg
        B, S = images.shape[:2]
        key = jax.random.PRNGKey(cfg.seed)

        all_track, all_vis, all_score = [], [], []
        for qi, qframe in enumerate(query_indices):
            key, sub = jax.random.split(key)
            seg_mask = None
            if masks is not None:
                seg_mask = jnp.asarray(masks[qframe] > 0.5)
            qp, qp_valid = get_query_points(
                images[0, qframe], sub, cfg.query_method,
                cfg.max_query_pts, seg_invalid_mask=seg_mask)

            order = np.arange(S)
            order[0], order[qframe] = qframe, 0
            inv_order = np.argsort(order)

            imgs_q = images[:, order]
            fmaps_q = fmaps[:, order]

            # chunk points so each tracker call stays under its budget
            chunk = max(256, cfg.max_points_num // S)
            fine_chunk = max(128, cfg.max_fine_points_num // S)
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
            track = jnp.concatenate(tracks, axis=2)[:, inv_order]
            vis = jnp.concatenate(viss, axis=2)[:, inv_order]
            score = jnp.concatenate(scores, axis=2)[:, inv_order]
            # drop points whose extraction was invalid
            vis = vis * qp_valid[None, None, :]
            all_track.append(track)
            all_vis.append(vis)
            all_score.append(score)

        return (jnp.concatenate(all_track, axis=2),
                jnp.concatenate(all_vis, axis=2),
                jnp.concatenate(all_score, axis=2))

    def sparse_reconstruct(self, images, masks=None, image_names=None,
                           output_dir=None):
        """Full sparse pipeline on (S, R, R, 3) images in [0, 1].

        Returns a predictions dict (cameras, points, masks, timings).
        Parity: runner.py:292-633.
        """
        cfg = self.cfg
        t_start = time.time()
        images = jnp.asarray(images)[None]  # (1, S, R, R, 3)
        B, S, H, W, _ = images.shape
        timings = {}

        # 1. query frames
        query_indices = self.select_query_frames(S)

        # 2. camera init
        t0 = time.time()
        pose_enc = self._camera_forward(images[:, :, ::3, ::3])[
            "pred_pose_enc"]
        extr0, intr0 = pose_encoding_to_extri_intri(pose_enc[0], (H, W))
        timings["camera_init"] = time.time() - t0

        # 3. feature maps
        t0 = time.time()
        fmaps = self._fmaps(images)
        timings["fmaps"] = time.time() - t0

        # 4. tracking
        t0 = time.time()
        track, vis, score = self.predict_tracks(images, fmaps,
                                                query_indices, masks)
        if cfg.comple_nonvis:
            track, vis, score = self._comple_nonvis(
                images, fmaps, track, vis, score, masks)
        timings["tracking"] = time.time() - t0

        # 5. preliminary two-view geometry
        t0 = time.time()
        pre = estimate_preliminary_cameras(
            track, vis, W, H, jax.random.PRNGKey(cfg.seed + 1),
            max_ransac_iters=1024, lo_num=128)
        timings["preliminary"] = time.time() - t0

        # 6. SfM solve
        t0 = time.time()
        sfm_cfg = SfmConfig(
            init_max_reproj_error=cfg.init_max_reproj_error,
            max_reproj_error=cfg.max_reproj_error,
            robust_refine=cfg.robust_refine,
            ba_iters=cfg.ba_iters,
            shared_camera=cfg.shared_camera,
            camera_type=cfg.camera_type)
        out = run_sfm(extr0, intr0, track[0], vis[0], (W, H),
                      fmat_inlier_mask=pre["fmat_inlier_mask"][0],
                      score=score[0], cfg=sfm_cfg)
        timings["sfm"] = time.time() - t0

        # 7. colors + export
        colors = None
        if cfg.extract_color:
            rgb = sample_features4d(images[0], track[0])  # S acts as batch
            w = (out["valid_2d_mask"]).astype(jnp.float32)[..., None]
            colors = (jnp.sum(rgb * w, axis=0)
                      / jnp.maximum(jnp.sum(w, axis=0), 1))
        predictions = {
            **{k: np.asarray(v) if v is not None else None
               for k, v in out.items()},
            "pred_track": np.asarray(track),
            "pred_vis": np.asarray(vis),
            "pred_score": np.asarray(score),
            "colors": None if colors is None else np.asarray(colors),
            "timings": timings,
            "total_time": time.time() - t_start,
        }
        if output_dir is not None:
            self.save_reconstruction(predictions, (W, H), image_names,
                                     output_dir)
        return predictions

    def _comple_nonvis(self, images, fmaps, track, vis, score, masks):
        """Re-query frames with too few visible points, then escalate.

        Parity: runner.py:1201-1282 — first a plain re-query from the two
        least-visible frames; if frames still lack inliers, a second round
        with the combined extractor set (the reference escalates to
        'sp+sift+aliked').
        """
        cfg = self.cfg
        for round_idx in range(2):
            vis_count = np.asarray(jnp.sum(vis[0] > 0.05, axis=-1))
            bad = [int(i) for i in np.nonzero(
                vis_count < cfg.min_vis_points)[0]]
            if not bad:
                break
            method = cfg.query_method if round_idx == 0 else                 "sift+harris+grid"
            orig = cfg.query_method
            cfg.query_method = method
            try:
                t2, v2, s2 = self.predict_tracks(images, fmaps, bad[:2],
                                                 masks)
            finally:
                cfg.query_method = orig
            track = jnp.concatenate([track, t2], axis=2)
            vis = jnp.concatenate([vis, v2], axis=2)
            score = jnp.concatenate([score, s2], axis=2)
        return track, vis, score

    def triangulate_extra_points(self, images, fmaps, extrinsics,
                                 intrinsics, num_extra: int = 4096):
        """Densify: grid query points tracked + triangulated, no BA.

        Parity: runner.py:635-742 (`triangulate_extra_points`).
        Returns dict with ``points3d (N,3)``, ``valid (N,)``,
        ``tracks (S,N,2)``, ``colors (N,3)``.
        """
        from vggsfm_tpu.extractors.dispatch import grid_keypoints
        from vggsfm_tpu.geometry.cameras import cam_from_img
        from vggsfm_tpu.ops.triangulation import triangulate_tracks

        B, S, H, W, _ = images.shape
        qp = grid_keypoints(H, W, num_extra)[None]
        chunk = max(256, self.cfg.max_points_num // S)
        tr_all, vis_all = [], []
        for start in range(0, qp.shape[1], chunk):
            t, v = self._coarse_track(fmaps, qp[:, start: start + chunk])
            tr_all.append(t)
            vis_all.append(v)
        tr = jnp.concatenate(tr_all, axis=2)[0]
        vi = jnp.concatenate(vis_all, axis=2)[0]

        tn = cam_from_img(tr, intrinsics)
        pts, inl_num, _ = triangulate_tracks(
            jnp.asarray(extrinsics), tn, track_vis=vi,
            max_ransac_iters=64, seed=7)
        valid = inl_num >= 3
        colors = sample_features4d(images[0], tr)
        w = (vi > 0.05).astype(jnp.float32)[..., None]
        rgb = jnp.sum(colors * w, axis=0) / jnp.maximum(
            jnp.sum(w, axis=0), 1)
        return {"points3d": np.asarray(pts), "valid": np.asarray(valid),
                "tracks": np.asarray(tr), "colors": np.asarray(rgb)}

    def save_reconstruction(self, predictions, image_size, image_names,
                            output_dir):
        """Write COLMAP sparse model. Parity: runner.py:887-911."""
        valid = predictions["valid_tracks"]
        obs = predictions["valid_2d_mask"] & valid[None]
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
        write_model(rec, os.path.join(output_dir, "sparse"), ext=".bin")
        return rec

    def run_scene(self, scene_dir: str, output_dir: str | None = None):
        """Convenience: load a scene folder and reconstruct it."""
        loader = DemoLoader(scene_dir, img_size=self.cfg.img_size)
        data = loader.load()
        return self.sparse_reconstruct(
            data["images"], masks=data["masks"],
            image_names=data["image_names"],
            output_dir=output_dir)
