"""Windowed incremental reconstruction for long sequences.

Parity map (reference vggsfm/runners/video_runner.py):
  * process_initial_window (:121-140)  -> initial sparse solve;
  * move_window / prepare_window_data (:640-751, :1051-1187) -> track map
    points + fresh queries through each window;
  * align_next_window (:941-1017)      -> PnP + pose refinement against the
    frozen map (per-frame, batched on device);
  * triangulate_window_points (:1189-1262) -> LORANSAC triangulation of the
    new tracks over the window;
  * windowed BA with constant old poses/points (:800-836, 1321-1331) ->
    dense in-graph LM with freeze masks;
  * joint_BA (:494-541)                -> sparse implicit-Schur LM over the
    whole registered sequence.

The map lives on host as growing numpy registries (points, flat
observations); every solve step is a fixed-shape jitted kernel. Windows are
padded to the configured window size so each step compiles once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.ba import (
    BAConfig,
    SparseBAConfig,
    bundle_adjust,
    bundle_adjust_sparse,
)
from vggsfm_tpu.extractors import get_query_points
from vggsfm_tpu.geometry.cameras import cam_from_img, project_points
from vggsfm_tpu.ops.triangulation import triangulate_tracks
from vggsfm_tpu.sfm.refine import refine_poses
from vggsfm_tpu.twoview.pnp import absolute_pose_ransac


@dataclasses.dataclass
class VideoConfig:
    init_window_size: int = 16
    window_size: int = 8
    joint_ba_interval: int = 4
    max_query_pts: int = 1024
    query_method: str = "sift"
    min_inlier_per_frame: int = 30
    max_reproj_error: float = 4.0
    vis_thresh: float = 0.05
    seed: int = 0


class MapRegistry:
    """Host-side map state: growing point + observation stores."""

    def __init__(self):
        self.xyz = np.zeros((0, 3), np.float32)
        self.obs_frame = np.zeros((0,), np.int32)
        self.obs_point = np.zeros((0,), np.int32)
        self.obs_xy = np.zeros((0, 2), np.float32)

    def save(self, path: str) -> None:
        np.savez_compressed(path, xyz=self.xyz, obs_frame=self.obs_frame,
                            obs_point=self.obs_point, obs_xy=self.obs_xy)

    @classmethod
    def load(cls, path: str) -> "MapRegistry":
        data = np.load(path)
        reg = cls()
        reg.xyz = data["xyz"]
        reg.obs_frame = data["obs_frame"]
        reg.obs_point = data["obs_point"]
        reg.obs_xy = data["obs_xy"]
        return reg

    @property
    def num_points(self):
        return len(self.xyz)

    def add_points(self, xyz: np.ndarray) -> np.ndarray:
        start = self.num_points
        self.xyz = np.concatenate([self.xyz, np.asarray(xyz, np.float32)])
        return np.arange(start, self.num_points, dtype=np.int32)

    def add_observations(self, frames, points, xys):
        self.obs_frame = np.concatenate(
            [self.obs_frame, np.asarray(frames, np.int32)])
        self.obs_point = np.concatenate(
            [self.obs_point, np.asarray(points, np.int32)])
        self.obs_xy = np.concatenate(
            [self.obs_xy, np.asarray(xys, np.float32)])


class VideoRunner:
    """Incremental runner driving a VGGSfMRunner's models over windows."""

    def __init__(self, sparse_runner, cfg: VideoConfig = VideoConfig()):
        self.r = sparse_runner
        self.cfg = cfg

    # ------------------------------------------------------------------

    def _track_window(self, images_w, query_xy):
        """Track query points (N, 2) through window frames (Sw, R, R, 3).

        Frame 0 of the window is the query frame. Returns
        (tracks (Sw, N, 2), vis (Sw, N))."""
        imj = jnp.asarray(images_w)[None]
        fmaps = self.r._fmaps(imj)
        track, vis = self.r._coarse_track(fmaps, jnp.asarray(query_xy)[None])
        if self.r.cfg.fine_tracking:
            track, _ = self.r._fine_track(imj, track)
        return np.asarray(track[0]), np.asarray(vis[0])

    def save_checkpoint(self, path: str, reg, extrinsics, intrinsics,
                        registered, end: int, windows_done: int) -> None:
        """Persist the full incremental state (resume point).

        The reference has no pipeline-state checkpointing (SURVEY §5); its
        point_dict/frame_dict is the natural resume state — here that is
        the map registry + camera arrays + window cursor.
        """
        reg.save(path + ".map.npz")
        np.savez_compressed(path + ".state.npz", extrinsics=extrinsics,
                            intrinsics=intrinsics, registered=registered,
                            end=end, windows_done=windows_done)

    @staticmethod
    def load_checkpoint(path: str):
        reg = MapRegistry.load(path + ".map.npz")
        st = np.load(path + ".state.npz")
        return (reg, st["extrinsics"].copy(), st["intrinsics"].copy(),
                st["registered"].copy(), int(st["end"]),
                int(st["windows_done"]))

    def run(self, images: np.ndarray, output_dir: str | None = None,
            resume_from: str | None = None,
            checkpoint_path: str | None = None):
        """images: (T, R, R, 3) in [0, 1]. Returns predictions dict.

        `resume_from` restores a prior `checkpoint_path` state and
        continues from its window cursor; `checkpoint_path` saves state
        after every joint BA.
        """
        cfg = self.cfg
        T, R_img = images.shape[0], images.shape[1]
        W = R_img
        H = R_img

        if resume_from is not None:
            (reg, extrinsics, intrinsics, registered, end,
             windows_done) = self.load_checkpoint(resume_from)
        else:
            reg = MapRegistry()
            extrinsics = np.zeros((T, 3, 4), np.float32)
            intrinsics = np.zeros((T, 3, 3), np.float32)
            registered = np.zeros((T,), bool)

            # ---- initial window: full sparse solve
            S0 = min(cfg.init_window_size, T)
            init = self.r.sparse_reconstruct(images[:S0])
            extrinsics[:S0] = init["extrinsics"]
            intrinsics[:S0] = init["intrinsics"]
            registered[:S0] = True

            valid = init["valid_tracks"]
            pts = init["points3d"][valid]
            obs2d = init["valid_2d_mask"][:, valid]
            track2d = init["pred_track"][0][:, valid]
            pids = reg.add_points(pts)
            fr, pv = np.nonzero(obs2d)
            reg.add_observations(fr, pids[pv], track2d[fr, pv])

            windows_done = 0
            end = S0
        while end < T:
            w_end = min(end + cfg.window_size, T)
            q = end - 1  # query = last registered frame
            frames_w = [q] + list(range(end, w_end))
            Sw = len(frames_w)
            images_w = images[frames_w]

            # query points: reprojected map points visible in q + fresh
            proj_q = np.asarray(project_points(
                jnp.asarray(reg.xyz), jnp.asarray(extrinsics[q][None]),
                jnp.asarray(intrinsics[q][None])))[0]
            vis_q = ((proj_q[:, 0] >= 0) & (proj_q[:, 0] < W)
                     & (proj_q[:, 1] >= 0) & (proj_q[:, 1] < H))
            map_ids = np.nonzero(vis_q)[0][-cfg.max_query_pts:]
            n_map = len(map_ids)

            key = jax.random.PRNGKey(cfg.seed + 17 * end)
            fresh_xy, fresh_valid = get_query_points(
                jnp.asarray(images[q]), key, cfg.query_method,
                cfg.max_query_pts)
            fresh_xy = np.asarray(fresh_xy)[np.asarray(fresh_valid)]

            query_xy = np.concatenate([proj_q[map_ids], fresh_xy], axis=0)
            tracks_w, vis_w = self._track_window(images_w, query_xy)

            # ---- register new frames by PnP on tracked map points
            map_tracks = tracks_w[:, :n_map]  # (Sw, n_map, 2)
            map_vis = vis_w[:, :n_map] > cfg.vis_thresh
            new_frames = frames_w[1:]
            X_map = reg.xyz[map_ids]

            if n_map >= 6:
                pnp = absolute_pose_ransac(
                    jnp.asarray(np.repeat(X_map[None], Sw - 1, 0)),
                    jnp.asarray(map_tracks[1:]),
                    jnp.asarray(intrinsics[q][None].repeat(Sw - 1, 0)),
                    jax.random.PRNGKey(cfg.seed + end),
                    valid_mask=jnp.asarray(map_vis[1:]),
                    max_ransac_iters=128, lo_num=16, f_trials=1)
                extr_new = np.asarray(pnp["extrinsics"])
                ok = np.asarray(pnp["inlier_num"]) >= \
                    cfg.min_inlier_per_frame
            else:
                # too few tracked map points (e.g. degenerate window):
                # constant-velocity fallback — keep the query pose
                extr_new = np.repeat(extrinsics[q][None], Sw - 1, 0)
                ok = np.zeros((Sw - 1,), bool)
            for i, fidx in enumerate(new_frames):
                extrinsics[fidx] = extr_new[i] if ok[i] else extrinsics[q]
                intrinsics[fidx] = intrinsics[q]
                registered[fidx] = True

            if n_map >= 6:
                # refine new poses against the frozen map
                extr_w = jnp.asarray(extrinsics[frames_w])
                intr_w = jnp.asarray(intrinsics[frames_w])
                obs_w = jnp.asarray(
                    np.concatenate([map_vis[:1], map_vis[1:]], axis=0))
                extr_w, intr_w, _, _ = refine_poses(
                    extr_w, intr_w, jnp.asarray(X_map),
                    jnp.asarray(map_tracks), obs_w, (W, H),
                    refine_intrinsics=False)
                extr_w = np.asarray(extr_w)
                for i, fidx in enumerate(frames_w[1:], start=1):
                    extrinsics[fidx] = extr_w[i]

            # record observations of map points in the new frames
            for i, fidx in enumerate(new_frames, start=1):
                seen = np.nonzero(map_vis[i])[0]
                reg.add_observations(
                    np.full(len(seen), fidx), map_ids[seen],
                    map_tracks[i][seen])

            # ---- triangulate fresh tracks over the window
            fresh_tracks = tracks_w[:, n_map:]
            fresh_vis = vis_w[:, n_map:]
            tn = cam_from_img(jnp.asarray(fresh_tracks),
                              jnp.asarray(intrinsics[frames_w]))
            pts_new, inl_num, inl_mask = triangulate_tracks(
                jnp.asarray(extrinsics[frames_w]), tn,
                track_vis=jnp.asarray(fresh_vis), max_ransac_iters=32,
                seed=end)
            pts_new = np.asarray(pts_new)
            inl_mask = np.asarray(inl_mask).T  # (Sw, Nf)
            keep = np.asarray(inl_num) >= 2
            new_ids = reg.add_points(pts_new[keep])
            fr_i, pv_i = np.nonzero(inl_mask[:, keep])
            frame_lookup = np.asarray(frames_w)
            reg.add_observations(frame_lookup[fr_i], new_ids[pv_i],
                                 fresh_tracks[:, keep][fr_i, pv_i])

            end = w_end
            windows_done += 1

            if windows_done % cfg.joint_ba_interval == 0 or end >= T:
                self._joint_ba(extrinsics, intrinsics, reg, registered)
                if checkpoint_path is not None:
                    self.save_checkpoint(checkpoint_path, reg, extrinsics,
                                         intrinsics, registered, end,
                                         windows_done)

        predictions = {
            "extrinsics": extrinsics,
            "intrinsics": intrinsics,
            "points3d": reg.xyz,
            "registered": registered,
            "num_points": reg.num_points,
            "num_observations": len(reg.obs_frame),
        }
        if output_dir is not None:
            self._export(predictions, reg, (W, H), output_dir)
        return predictions

    # ------------------------------------------------------------------

    def _joint_ba(self, extrinsics, intrinsics, reg: MapRegistry,
                  registered):
        """Sparse LM over all registered frames + map points."""
        T = extrinsics.shape[0]
        P = reg.num_points
        if P == 0 or len(reg.obs_frame) == 0:
            return
        pose_free = jnp.asarray(registered & (np.arange(T) != 0))
        cfg = SparseBAConfig(max_iterations=12, refine_focal=False,
                             cg_iters=30, robust_loss="cauchy",
                             loss_scale=4.0)
        extr, intr, _, X, info = bundle_adjust_sparse(
            jnp.asarray(extrinsics), jnp.asarray(intrinsics),
            jnp.asarray(reg.xyz),
            jnp.asarray(reg.obs_frame), jnp.asarray(reg.obs_point),
            jnp.asarray(reg.obs_xy),
            jnp.ones((len(reg.obs_frame),), jnp.float32),
            pose_free=pose_free, cfg=cfg)
        extrinsics[:] = np.asarray(extr)
        intrinsics[:] = np.asarray(intr)
        reg.xyz = np.asarray(X)

    def _export(self, predictions, reg, image_size, output_dir):
        import os

        from vggsfm_tpu.io.colmap import (
            Camera, Image, Point3D, Reconstruction, write_model)
        from vggsfm_tpu.io.bridge import _camera_params, _matrix_to_quat

        T = predictions["extrinsics"].shape[0]
        cameras, images_d, points = {}, {}, {}
        per_image: dict = {t: ([], []) for t in range(T)}
        point_tracks: dict = {}
        for o in range(len(reg.obs_frame)):
            f, p = int(reg.obs_frame[o]), int(reg.obs_point[o])
            xs, ps = per_image[f]
            point_tracks.setdefault(p, []).append((f + 1, len(xs)))
            xs.append(reg.obs_xy[o])
            ps.append(p)
        for t in range(T):
            cameras[t + 1] = Camera(
                t + 1, "SIMPLE_PINHOLE", image_size[0], image_size[1],
                _camera_params("SIMPLE_PINHOLE",
                               predictions["intrinsics"][t], None))
            xs, ps = per_image[t]
            images_d[t + 1] = Image(
                t + 1, _matrix_to_quat(predictions["extrinsics"][t, :, :3]),
                predictions["extrinsics"][t, :, 3].copy(), t + 1,
                f"frame_{t:05d}.png",
                np.asarray(xs).reshape(-1, 2),
                np.asarray(ps, np.int64))
        for p, track in point_tracks.items():
            ims = np.asarray([a for a, _ in track], np.int32)
            idxs = np.asarray([b for _, b in track], np.int32)
            points[p] = Point3D(p, reg.xyz[p], np.zeros(3, np.uint8), 0.0,
                                ims, idxs)
        write_model(Reconstruction(cameras, images_d, points),
                    os.path.join(output_dir, "sparse"), ext=".bin")
