"""Heavy video-runner end-to-end cases, run in fresh subprocesses.

The environment's XLA:CPU backend aborts the process after enough
compiles accumulate (see conftest.py); these window-heavy incremental
runs are the main triggers. Each case is a standalone main so the pytest
wrappers can run them in a clean interpreter:

    python -m tests.video_cases oracle|radial
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _setup_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def _gt_scene(rng, T, R_img, N, project):
    video = rng.uniform(size=(T, R_img, R_img, 3)).astype(np.float32)
    return video


def case_oracle(tmp_dir: str) -> None:
    """Projection-oracle tracker: incremental machinery recovers poses."""
    _setup_cpu()
    import jax.numpy as jnp

    from vggsfm_tpu.geometry.metrics import pose_auc30
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
    from vggsfm_tpu.video import VideoConfig, VideoRunner

    rng = np.random.default_rng(0)
    T, R_img, N = 12, 128, 300
    f = float(R_img)
    K = np.array([[f, 0, R_img / 2], [0, f, R_img / 2], [0, 0, 1.0]])
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(N, 3))
    extr_gt = np.zeros((T, 3, 4))
    for t in range(T):
        a = 0.04 * t
        Rm = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                       [-np.sin(a), 0, np.cos(a)]])
        tr = np.array([0.15 * t, 0.01 * t, 0.02 * t])
        extr_gt[t] = np.concatenate([Rm, tr[:, None]], axis=1)

    def project(t, pts):
        Xc = (extr_gt[t, :, :3] @ pts.T).T + extr_gt[t, :, 3]
        uv = (K @ Xc.T).T
        return uv[:, :2] / uv[:, 2:]

    video = _gt_scene(rng, T, R_img, N, project)

    scfg = RunnerConfig(img_size=R_img, query_frame_num=1,
                        max_query_pts=64, query_method="harris",
                        fine_tracking=False, comple_nonvis=False,
                        robust_refine=0, ba_iters=1)
    vcfg = VideoConfig(init_window_size=4, window_size=3,
                       joint_ba_interval=2, max_query_pts=128,
                       query_method="harris", min_inlier_per_frame=10)
    runner = VideoRunner(VGGSfMRunner(scfg), vcfg)

    def oracle_init(images_init, **kw):
        S0 = images_init.shape[0]
        track = np.stack([project(t, X) for t in range(S0)])
        track += rng.normal(scale=0.2, size=track.shape)
        return {
            "extrinsics": extr_gt[:S0].astype(np.float32),
            "intrinsics": np.tile(K, (S0, 1, 1)).astype(np.float32),
            "points3d": X.astype(np.float32),
            "valid_tracks": np.ones(N, bool),
            "valid_2d_mask": np.ones((S0, N), bool),
            "pred_track": track[None].astype(np.float32),
        }

    runner.r.sparse_reconstruct = oracle_init

    def oracle_track(images_w, query_xy, frames_w=[None]):
        Sw = images_w.shape[0]
        Nq = len(query_xy)
        tr = np.zeros((Sw, Nq, 2), np.float32)
        vis = np.zeros((Sw, Nq), np.float32)
        q = oracle_track.frames[0]
        proj_q = project(q, X)
        d = np.linalg.norm(query_xy[:, None] - proj_q[None], axis=-1)
        nearest = d.argmin(1)
        matched = d.min(1) < 2.0
        for i, t in enumerate(oracle_track.frames):
            tr[i] = project(t, X)[nearest]
            tr[i] += rng.normal(scale=0.2, size=tr[i].shape)
            vis[i] = matched.astype(np.float32)
        return tr, vis

    def spy_track(self, images_w, query_xy, frames_w=None):
        oracle_track.frames = list(frames_w)
        return oracle_track(images_w, np.asarray(query_xy))

    runner._track_window = types.MethodType(spy_track, runner)

    # export fidelity: real filenames + non-square crop params (120x160
    # originals resized to the square working resolution) + point colors
    import os

    from vggsfm_tpu.datasets.demo_loader import pad_and_resize_image
    from vggsfm_tpu.io import read_model

    names = [f"shot_{t:03d}.jpg" for t in range(T)]
    one = pad_and_resize_image(
        np.zeros((120, 160, 3), np.uint8), R_img)[2]
    crop_params = np.tile(one, (T, 1))

    preds = runner.run(video, output_dir=tmp_dir, image_names=names,
                       crop_params=crop_params)
    assert preds["registered"].all()
    auc = pose_auc30(jnp.asarray(preds["extrinsics"]),
                     jnp.asarray(extr_gt, np.float32))
    assert float(auc) > 0.85, float(auc)

    rec = read_model(os.path.join(tmp_dir, "sparse"))
    im0 = rec.images[1]
    assert im0.name == "shot_000.jpg", im0.name
    cam0 = rec.cameras[im0.camera_id]
    # intrinsics back in original pixel space: 160x120 camera, principal
    # point at the original center
    assert (cam0.width, cam0.height) == (160, 120)
    assert abs(cam0.params[1] - 80) < 1e-6 and abs(
        cam0.params[2] - 60) < 1e-6
    # point colors sampled from the frames, not zero-filled
    rgbs = np.stack([p.rgb for p in rec.points3D.values()])
    assert (rgbs.sum(axis=1) > 0).mean() > 0.5
    print("ORACLE_OK", float(auc))


def case_drift(tmp_dir: str) -> None:
    """60-frame orbit with joint BA every 8 windows: the incremental
    machinery (PnP + pose refine + per-window BA, parity: reference
    windowed BA video_runner.py:800-836) must keep drift bounded over a
    long sequence. The window-BA freeze semantics are unit-tested in
    tests/test_window_ba.py."""
    _setup_cpu()
    import jax.numpy as jnp

    from vggsfm_tpu.geometry.metrics import pose_auc30
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
    from vggsfm_tpu.video import VideoConfig, VideoRunner

    rng = np.random.default_rng(7)
    T, R_img, N = 60, 128, 500
    f = float(R_img)
    K = np.array([[f, 0, R_img / 2], [0, f, R_img / 2], [0, 0, 1.0]])
    # orbit scene: cameras circle a point cloud at constant radius so
    # every frame keeps the cloud in view across all 60 frames
    C = np.array([0.0, 0.0, 8.0])
    X = C + rng.uniform([-2.5, -2.5, -2.0], [2.5, 2.5, 2.0], size=(N, 3))
    extr_gt = np.zeros((T, 3, 4))
    for t in range(T):
        th = 0.02 * t
        p = C + 8.0 * np.array([np.sin(th), 0.08 * np.sin(3 * th),
                                -np.cos(th)])
        z = C - p
        z = z / np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        Rm = np.stack([x, y, z])
        extr_gt[t, :, :3] = Rm
        extr_gt[t, :, 3] = -Rm @ p

    def project(t, pts):
        Xc = (extr_gt[t, :, :3] @ pts.T).T + extr_gt[t, :, 3]
        uv = (K @ Xc.T).T
        return uv[:, :2] / uv[:, 2:]

    video = rng.uniform(size=(T, R_img, R_img, 3)).astype(np.float32)

    scfg = RunnerConfig(img_size=R_img, query_frame_num=1,
                        max_query_pts=64, query_method="harris",
                        fine_tracking=False, comple_nonvis=False,
                        robust_refine=0, ba_iters=1)
    vcfg = VideoConfig(init_window_size=4, window_size=3,
                       joint_ba_interval=8, max_query_pts=128,
                       query_method="harris", min_inlier_per_frame=10)
    runner = VideoRunner(VGGSfMRunner(scfg), vcfg)

    def oracle_init(images_init, **kw):
        S0 = images_init.shape[0]
        track = np.stack([project(t, X) for t in range(S0)])
        track += rng.normal(scale=0.3, size=track.shape)
        return {
            "extrinsics": extr_gt[:S0].astype(np.float32),
            "intrinsics": np.tile(K, (S0, 1, 1)).astype(np.float32),
            "points3d": X.astype(np.float32),
            "valid_tracks": np.ones(N, bool),
            "valid_2d_mask": np.ones((S0, N), bool),
            "pred_track": track[None].astype(np.float32),
        }

    runner.r.sparse_reconstruct = oracle_init

    def oracle_track(images_w, query_xy, frames_w=[None]):
        Sw = images_w.shape[0]
        Nq = len(query_xy)
        tr = np.zeros((Sw, Nq, 2), np.float32)
        vis = np.zeros((Sw, Nq), np.float32)
        q = oracle_track.frames[0]
        proj_q = project(q, X)
        d = np.linalg.norm(query_xy[:, None] - proj_q[None], axis=-1)
        nearest = d.argmin(1)
        matched = d.min(1) < 2.0
        for i, t in enumerate(oracle_track.frames):
            tr[i] = project(t, X)[nearest]
            tr[i] += rng.normal(scale=0.3, size=tr[i].shape)
            vis[i] = matched.astype(np.float32)
        return tr, vis

    def spy_track(self, images_w, query_xy, frames_w=None):
        oracle_track.frames = list(frames_w)
        return oracle_track(images_w, np.asarray(query_xy))

    runner._track_window = types.MethodType(spy_track, runner)

    preds = runner.run(video, output_dir=None)
    assert preds["registered"].all()
    auc = pose_auc30(jnp.asarray(preds["extrinsics"]),
                     jnp.asarray(extr_gt, np.float32))
    assert float(auc) > 0.85, float(auc)
    print("DRIFT_OK", float(auc))


def case_radial(tmp_dir: str) -> None:
    """SIMPLE_RADIAL video: distorted tracks register; k recovered."""
    _setup_cpu()
    import jax.numpy as jnp

    from vggsfm_tpu.geometry.cameras import img_from_cam
    from vggsfm_tpu.geometry.metrics import pose_auc30
    from vggsfm_tpu.io import read_model
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
    from vggsfm_tpu.video import VideoConfig, VideoRunner
    import os

    rng = np.random.default_rng(1)
    T, R_img, N = 10, 128, 300
    f = float(R_img)
    K = np.array([[f, 0, R_img / 2], [0, f, R_img / 2], [0, 0, 1.0]])
    k_gt = -0.08
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(N, 3))
    extr_gt = np.zeros((T, 3, 4))
    for t in range(T):
        a = 0.04 * t
        Rm = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                       [-np.sin(a), 0, np.cos(a)]])
        tr = np.array([0.15 * t, 0.01 * t, 0.02 * t])
        extr_gt[t] = np.concatenate([Rm, tr[:, None]], axis=1)

    def project(t, pts):
        Xc = (extr_gt[t, :, :3] @ pts.T).T + extr_gt[t, :, 3]
        return np.asarray(img_from_cam(
            jnp.asarray(K), jnp.asarray(Xc.T),
            extra_params=jnp.asarray([k_gt])))

    video = rng.uniform(size=(T, R_img, R_img, 3)).astype(np.float32)

    scfg = RunnerConfig(img_size=R_img, query_frame_num=1,
                        max_query_pts=64, query_method="harris",
                        fine_tracking=False, comple_nonvis=False,
                        robust_refine=0, ba_iters=1,
                        camera_type="SIMPLE_RADIAL")
    vcfg = VideoConfig(init_window_size=4, window_size=3,
                       joint_ba_interval=2, max_query_pts=128,
                       query_method="harris", min_inlier_per_frame=10,
                       camera_type="SIMPLE_RADIAL",
                       align_with_camera_predictor=False)
    runner = VideoRunner(VGGSfMRunner(scfg), vcfg)

    def oracle_init(images_init, **kw):
        S0 = images_init.shape[0]
        track = np.stack([project(t, X) for t in range(S0)])
        return {
            "extrinsics": extr_gt[:S0].astype(np.float32),
            "intrinsics": np.tile(K, (S0, 1, 1)).astype(np.float32),
            "extra_params": np.full((S0, 1), k_gt, np.float32),
            "points3d": X.astype(np.float32),
            "valid_tracks": np.ones(N, bool),
            "valid_2d_mask": np.ones((S0, N), bool),
            "pred_track": track[None].astype(np.float32),
        }

    runner.r.sparse_reconstruct = oracle_init

    def oracle_track(images_w, query_xy, frames_w=[None]):
        Sw = images_w.shape[0]
        Nq = len(query_xy)
        tr = np.zeros((Sw, Nq, 2), np.float32)
        vis = np.zeros((Sw, Nq), np.float32)
        q = oracle_track.frames[0]
        proj_q = project(q, X)
        d = np.linalg.norm(query_xy[:, None] - proj_q[None], axis=-1)
        nearest = d.argmin(1)
        matched = d.min(1) < 2.0
        for i, t in enumerate(oracle_track.frames):
            tr[i] = project(t, X)[nearest]
            tr[i] += rng.normal(scale=0.15, size=tr[i].shape)
            vis[i] = matched.astype(np.float32)
        return tr, vis

    def spy_track(self, images_w, query_xy, frames_w=None):
        oracle_track.frames = list(frames_w)
        return oracle_track(images_w, np.asarray(query_xy))

    runner._track_window = types.MethodType(spy_track, runner)

    preds = runner.run(video, output_dir=tmp_dir)
    assert preds["registered"].all()
    auc = pose_auc30(jnp.asarray(preds["extrinsics"]),
                     jnp.asarray(extr_gt, np.float32))
    assert float(auc) > 0.8, float(auc)
    assert preds["extra_params"] is not None
    assert abs(float(preds["extra_params"][0, 0]) - k_gt) < 0.04
    rec = read_model(os.path.join(tmp_dir, "sparse"))
    assert rec.cameras[1].model == "SIMPLE_RADIAL"
    assert len(rec.cameras[1].params) == 4
    print("RADIAL_OK", float(auc))


def _multihost_scene():
    """Deterministic 30-frame orbit scene shared by every host process."""
    rng = np.random.default_rng(21)
    T, R_img, N = 30, 128, 500
    f = float(R_img)
    K = np.array([[f, 0, R_img / 2], [0, f, R_img / 2], [0, 0, 1.0]])
    C = np.array([0.0, 0.0, 8.0])
    X = C + rng.uniform([-2.5, -2.5, -2.0], [2.5, 2.5, 2.0], size=(N, 3))
    extr_gt = np.zeros((T, 3, 4))
    for t in range(T):
        th = 0.03 * t
        p = C + 8.0 * np.array([np.sin(th), 0.08 * np.sin(3 * th),
                                -np.cos(th)])
        z = C - p
        z = z / np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        Rm = np.stack([x, y, z])
        extr_gt[t, :, :3] = Rm
        extr_gt[t, :, 3] = -Rm @ p
    video = rng.uniform(size=(T, R_img, R_img, 3)).astype(np.float32)
    return T, R_img, N, K, X, extr_gt, video


def case_multihost_worker(host_id: int, num_hosts: int,
                          exchange_dir: str) -> None:
    """One host of the multi-host video pipeline (oracle tracker).

    Every process builds the identical scene + runner; run_multihost
    computes the shared initial map, processes this host's contiguous
    frame block, publishes the partial map, and (host 0 only) merges +
    joint-BAs + asserts.
    """
    _setup_cpu()
    import jax.numpy as jnp

    from vggsfm_tpu.geometry.metrics import pose_auc30
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
    from vggsfm_tpu.video import VideoConfig, VideoRunner

    T, R_img, N, K, X, extr_gt, video = _multihost_scene()
    rng = np.random.default_rng(100 + host_id)

    def project(t, pts):
        Xc = (extr_gt[t, :, :3] @ pts.T).T + extr_gt[t, :, 3]
        uv = (K @ Xc.T).T
        return uv[:, :2] / uv[:, 2:]

    scfg = RunnerConfig(img_size=R_img, query_frame_num=1,
                        max_query_pts=64, query_method="harris",
                        fine_tracking=False, comple_nonvis=False,
                        robust_refine=0, ba_iters=1)
    vcfg = VideoConfig(init_window_size=4, window_size=3,
                       joint_ba_interval=4, max_query_pts=128,
                       query_method="harris", min_inlier_per_frame=10)
    runner = VideoRunner(VGGSfMRunner(scfg), vcfg)

    def oracle_init(images_init, **kw):
        # deterministic across hosts: the initial map must be identical
        S0 = images_init.shape[0]
        track = np.stack([project(t, X) for t in range(S0)])
        track += np.random.default_rng(42).normal(scale=0.2,
                                                  size=track.shape)
        return {
            "extrinsics": extr_gt[:S0].astype(np.float32),
            "intrinsics": np.tile(K, (S0, 1, 1)).astype(np.float32),
            "points3d": X.astype(np.float32),
            "valid_tracks": np.ones(N, bool),
            "valid_2d_mask": np.ones((S0, N), bool),
            "pred_track": track[None].astype(np.float32),
        }

    runner.r.sparse_reconstruct = oracle_init

    def oracle_track(images_w, query_xy, frames_w=[None]):
        Sw = images_w.shape[0]
        Nq = len(query_xy)
        tr = np.zeros((Sw, Nq, 2), np.float32)
        vis = np.zeros((Sw, Nq), np.float32)
        q = oracle_track.frames[0]
        proj_q = project(q, X)
        d = np.linalg.norm(query_xy[:, None] - proj_q[None], axis=-1)
        nearest = d.argmin(1)
        matched = d.min(1) < 2.0
        for i, t in enumerate(oracle_track.frames):
            tr[i] = project(t, X)[nearest]
            tr[i] += rng.normal(scale=0.2, size=tr[i].shape)
            vis[i] = matched.astype(np.float32)
        return tr, vis

    def spy_track(self, images_w, query_xy, frames_w=None):
        oracle_track.frames = list(frames_w)
        return oracle_track(images_w, np.asarray(query_xy))

    runner._track_window = types.MethodType(spy_track, runner)

    preds = runner.run_multihost(video, num_hosts, host_id, exchange_dir,
                                 output_dir=exchange_dir)
    if host_id != 0:
        print(f"HOST{host_id}_OK")
        return
    assert preds["registered"].all(), preds["registered"]
    auc = pose_auc30(jnp.asarray(preds["extrinsics"]),
                     jnp.asarray(extr_gt, np.float32))
    assert float(auc) > 0.85, float(auc)
    assert preds["num_points"] >= N  # shared map + fused new points
    print("MULTIHOST_OK", float(auc))


def case_multihost(exchange_dir: str) -> None:
    """2-process multi-host run: host 1 in a subprocess, host 0 here."""
    import os
    import subprocess

    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_cpu_parallel_codegen_split_count=1")
    child = subprocess.Popen(
        [sys.executable, os.path.join(repo, "tests", "video_cases.py"),
         "multihost_worker", exchange_dir, "1", "2"],
        env=env, cwd=repo)
    try:
        case_multihost_worker(0, 2, exchange_dir)
    finally:
        rc = child.wait(timeout=1200)
    assert rc == 0, f"host-1 worker exited {rc}"


def case_stepback(tmp_dir: str) -> None:
    """Tracking from one specific query frame fails completely (zero
    visibility) — the retry schedule must step the query frame back and
    still register every frame with accurate poses (parity:
    video_runner.py:712-751 retries). Subprocess-isolated: the many
    per-window compiles are an XLA:CPU process-abort trigger under
    xdist (same flake class as the other cases here)."""
    _setup_cpu()
    import jax.numpy as jnp

    from vggsfm_tpu.geometry.metrics import pose_auc30
    from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
    from vggsfm_tpu.video import VideoConfig, VideoRunner

    rng = np.random.default_rng(3)
    T, R_img, N = 14, 128, 300
    f = float(R_img)
    K = np.array([[f, 0, R_img / 2], [0, f, R_img / 2], [0, 0, 1.0]])
    X = rng.uniform([-2, -2, 6], [2, 2, 10], size=(N, 3))
    extr_gt = np.zeros((T, 3, 4))
    for t in range(T):
        a = 0.04 * t
        Rm = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                       [-np.sin(a), 0, np.cos(a)]])
        tr = np.array([0.15 * t, 0.01 * t, 0.02 * t])
        extr_gt[t] = np.concatenate([Rm, tr[:, None]], axis=1)

    def project(t, pts):
        Xc = (extr_gt[t, :, :3] @ pts.T).T + extr_gt[t, :, 3]
        uv = (K @ Xc.T).T
        return uv[:, :2] / uv[:, 2:]

    video = rng.uniform(size=(T, R_img, R_img, 3)).astype(np.float32)

    scfg = RunnerConfig(img_size=R_img, query_frame_num=1,
                        max_query_pts=64, query_method="harris",
                        fine_tracking=False, comple_nonvis=False,
                        robust_refine=0, ba_iters=1)
    vcfg = VideoConfig(init_window_size=4, window_size=3,
                       joint_ba_interval=2, max_query_pts=128,
                       query_method="harris", min_inlier_per_frame=10,
                       max_step_back=2,
                       align_with_camera_predictor=False)
    runner = VideoRunner(VGGSfMRunner(scfg), vcfg)

    def oracle_init(images_init, **kw):
        S0 = images_init.shape[0]
        track = np.stack([project(t, X) for t in range(S0)])
        return {
            "extrinsics": extr_gt[:S0].astype(np.float32),
            "intrinsics": np.tile(K, (S0, 1, 1)).astype(np.float32),
            "points3d": X.astype(np.float32),
            "valid_tracks": np.ones(N, bool),
            "valid_2d_mask": np.ones((S0, N), bool),
            "pred_track": track[None].astype(np.float32),
        }

    runner.r.sparse_reconstruct = oracle_init

    BAD_QUERY = 6  # tracking FROM this frame yields nothing

    def spy_track(self, images_w, query_xy, frames_w=None):
        Sw = images_w.shape[0]
        Nq = len(query_xy)
        q = frames_w[0]
        tr = np.zeros((Sw, Nq, 2), np.float32)
        vis = np.zeros((Sw, Nq), np.float32)
        if q == BAD_QUERY:
            return tr, vis
        proj_q = project(q, X)
        qxy = np.asarray(query_xy)
        d = np.linalg.norm(qxy[:, None] - proj_q[None], axis=-1)
        nearest = d.argmin(1)
        matched = d.min(1) < 2.0
        for i, t in enumerate(frames_w):
            tr[i] = project(t, X)[nearest]
            vis[i] = matched.astype(np.float32)
        return tr, vis

    runner._track_window = types.MethodType(spy_track, runner)
    preds = runner.run(video)
    assert preds["registered"].all()
    auc = pose_auc30(jnp.asarray(preds["extrinsics"]),
                     jnp.asarray(extr_gt, np.float32))
    assert float(auc) > 0.85
    print("STEPBACK_OK")


if __name__ == "__main__":
    import tempfile

    case = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    if case == "multihost_worker":
        case_multihost_worker(int(sys.argv[3]), int(sys.argv[4]), out)
    else:
        {"oracle": case_oracle, "radial": case_radial,
         "drift": case_drift, "multihost": case_multihost,
         "stepback": case_stepback}[case](out)
