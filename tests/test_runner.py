"""Extractor, loader and runner smoke tests (tiny shapes, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vggsfm_tpu.extractors import (
    detect_dog_keypoints,
    detect_harris_keypoints,
    get_query_points,
)
from vggsfm_tpu.datasets.demo_loader import DemoLoader, pad_and_resize_image


def checkerboard(h, w, sq=16):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    board = (((yy // sq) + (xx // sq)) % 2).astype(np.float32)
    # small noise breaks the perfect periodicity (strict NMS suppresses
    # exactly-tied responses, which only happens on synthetic patterns)
    board += np.random.default_rng(1).normal(scale=0.01, size=board.shape)
    return board.astype(np.float32)


class TestExtractors:
    def test_harris_finds_checkerboard_corners(self):
        img = checkerboard(128, 128)
        xy, score, valid = detect_harris_keypoints(jnp.asarray(img), 256)
        xy = np.asarray(xy)[np.asarray(valid)]
        assert len(xy) > 20
        # corners lie at multiples of 16 (within a couple px)
        off = np.minimum(xy % 16, 16 - (xy % 16))
        assert np.median(off) < 3

    def test_dog_finds_blobs(self):
        img = np.zeros((128, 128), np.float32)
        rng = np.random.default_rng(0)
        centers = rng.uniform(20, 108, size=(12, 2))
        yy, xx = np.meshgrid(np.arange(128), np.arange(128), indexing="ij")
        for cx, cy in centers:
            img += np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 3.0**2))
        xy, score, valid = detect_dog_keypoints(jnp.asarray(img), 64)
        xy = np.asarray(xy)[np.asarray(valid)]
        assert len(xy) >= 10
        d = np.linalg.norm(xy[:, None] - centers[None], axis=-1).min(1)
        # most detections land on a blob
        assert np.median(d[:12]) < 4

    def test_get_query_points_mask_and_bbox(self):
        img = np.repeat(checkerboard(64, 64)[..., None], 3, axis=-1)
        seg = np.zeros((64, 64), bool)
        seg[:, :32] = True  # invalidate the left half
        xy, valid = get_query_points(
            jnp.asarray(img), jax.random.PRNGKey(0), "harris", 64,
            seg_invalid_mask=jnp.asarray(seg))
        xy, valid = np.asarray(xy), np.asarray(valid)
        assert valid.sum() > 0
        assert np.all(xy[valid][:, 0] >= 32)

    def test_combined_methods(self):
        img = np.repeat(checkerboard(64, 64)[..., None], 3, axis=-1)
        xy, valid = get_query_points(
            jnp.asarray(img), jax.random.PRNGKey(0), "sift+harris", 128)
        assert xy.shape == (128, 2)


class TestLoader:
    def _make_scene(self, tmp_path, n=3, h=48, w=64):
        from PIL import Image
        d = tmp_path / "scene" / "images"
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(n):
            arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i:02d}.png")
        return str(tmp_path / "scene")

    def test_load_scene(self, tmp_path):
        scene = self._make_scene(tmp_path)
        loader = DemoLoader(scene, img_size=64)
        data = loader.load()
        assert data["images"].shape == (3, 64, 64, 3)
        assert data["images"].dtype == np.float32
        assert data["images"].max() <= 1.0
        assert data["crop_params"].shape == (3, 8)
        assert data["masks"] is None

    def test_pad_and_resize_square_crop(self):
        img = (np.ones((40, 80, 3)) * 255).astype(np.uint8)
        img[:, :20] = 0  # left quarter black, cropped away by center square
        out, _, params = pad_and_resize_image(img, 64)
        assert out.shape == (64, 64, 3)
        assert params[0] == 80 and params[1] == 40


@pytest.mark.slow
class TestRunnerSmoke:
    def test_sparse_reconstruct_tiny(self, tmp_path):
        """Machinery smoke test: random weights, tiny scene; asserts the
        pipeline runs end-to-end and exports a readable COLMAP model."""
        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner
        from vggsfm_tpu.io import read_model

        rng = np.random.default_rng(0)
        S, R = 3, 128
        images = rng.uniform(size=(S, R, R, 3)).astype(np.float32)

        cfg = RunnerConfig(img_size=R, query_frame_num=1, max_query_pts=64,
                           query_method="harris", fine_tracking=False,
                           comple_nonvis=False, robust_refine=0, ba_iters=1)
        runner = VGGSfMRunner(cfg)
        out_dir = str(tmp_path / "out")
        os.makedirs(out_dir, exist_ok=True)
        preds = runner.sparse_reconstruct(
            images, image_names=[f"f{i}.png" for i in range(S)],
            output_dir=out_dir)
        assert preds["extrinsics"].shape == (S, 3, 4)
        assert preds["pred_track"].shape[1] == S
        rec = read_model(os.path.join(out_dir, "sparse"))
        assert len(rec.images) == S

    def test_filter_invalid_frame_export(self, tmp_path):
        """Frames failing the validity window are deregistered from the
        exported model, and crop-param rescale stays aligned by image id
        across the holes (parity: reference filter_invalid_frame)."""
        from vggsfm_tpu.io import read_model
        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

        rng = np.random.default_rng(1)
        S, R = 3, 128
        images = rng.uniform(size=(S, R, R, 3)).astype(np.float32)
        cfg = RunnerConfig(img_size=R, query_frame_num=1, max_query_pts=64,
                           query_method="harris", fine_tracking=False,
                           comple_nonvis=False, robust_refine=0, ba_iters=1)
        runner = VGGSfMRunner(cfg)
        preds = runner.sparse_reconstruct(images)
        # force frame 1 invalid and export
        preds["valid_frame_mask"] = np.array([True, False, True])
        names = [f"f{i}.png" for i in range(S)]
        crop = np.tile(
            np.array([160.0, 120.0, 2.0, 1.0, 0, -20, 160, 140],
                     np.float32), (S, 1))
        out_dir = str(tmp_path / "out")
        os.makedirs(out_dir, exist_ok=True)
        runner.save_reconstruction(preds, (R, R), names, out_dir,
                                   crop_params=crop)
        rec = read_model(os.path.join(out_dir, "sparse"))
        assert sorted(rec.images) == [1, 3]
        # id-indexed metadata: image 3 keeps its own name
        assert rec.images[3].name == "f2.png"
        # no surviving point observes the dropped frame
        for p in rec.points3D.values():
            assert 2 not in set(int(i) for i in p.image_ids)

    def test_demo_config_precedence(self, tmp_path):
        """YAML --config values win over untyped CLI defaults; explicit
        CLI flags win over the YAML."""
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import demo

        cfg_file = str(tmp_path / "cfg.yaml")
        with open(cfg_file, "w") as f:
            f.write("visual_tracks: true\n"
                    "extra_pt_pixel_interval: 16\n"
                    "max_query_pts: 777\n"
                    "fine_tracking: false\n")
        args = demo.parse_args(["scene", "--config", cfg_file,
                                "--max-query-pts", "111"])
        cfg = demo.build_config(args)
        assert cfg.visual_tracks is True          # YAML survives
        assert cfg.extra_pt_pixel_interval == 16  # YAML survives
        assert cfg.fine_tracking is False         # YAML survives
        assert cfg.max_query_pts == 111           # explicit CLI wins
        # explicit store_true flag beats the file too
        args2 = demo.parse_args(["scene", "--config", cfg_file,
                                 "--no-fine-tracking"])
        assert demo.build_config(args2).fine_tracking is False

    def test_run_scene_load_gt(self, tmp_path):
        """--load-gt: COLMAP GT under SCENE/sparse is scored as AUC@30."""
        from PIL import Image as PILImage

        from vggsfm_tpu.io import arrays_to_reconstruction, write_model
        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

        rng = np.random.default_rng(5)
        S, R = 2, 128
        scene = str(tmp_path / "scene")
        os.makedirs(os.path.join(scene, "images"))
        names = []
        for i in range(S):
            arr = (rng.uniform(size=(R, R, 3)) * 255).astype(np.uint8)
            name = f"f{i}.png"
            PILImage.fromarray(arr).save(
                os.path.join(scene, "images", name))
            names.append(name)
        # GT model: planted cameras + a few points
        extr = np.tile(np.eye(3, 4, dtype=np.float64), (S, 1, 1))
        extr[1, 0, 3] = 0.3
        intr = np.tile(np.array([[128.0, 0, 64], [0, 128, 64], [0, 0, 1]]),
                       (S, 1, 1))
        pts = rng.uniform([-1, -1, 4], [1, 1, 8], size=(12, 3))
        tracks = np.zeros((S, 12, 2))
        for s in range(S):
            Xc = (extr[s, :, :3] @ pts.T).T + extr[s, :, 3]
            uv = (intr[s] @ Xc.T).T
            tracks[s] = uv[:, :2] / uv[:, 2:]
        rec = arrays_to_reconstruction(
            pts, extr, intr, tracks, np.ones((S, 12), bool), (R, R),
            image_names=names)
        write_model(rec, os.path.join(scene, "sparse"), ext=".bin")

        cfg = RunnerConfig(img_size=R, query_frame_num=1, max_query_pts=64,
                           query_method="harris", fine_tracking=False,
                           comple_nonvis=False, robust_refine=0, ba_iters=1)
        preds = VGGSfMRunner(cfg).run_scene(scene, load_gt=True)
        assert 0.0 <= preds["gt_auc30"] <= 1.0

    def test_visualization_outputs(self, tmp_path):
        """visual_tracks / make_reproj_frames write overlays on export."""
        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

        rng = np.random.default_rng(2)
        S, R = 2, 128
        images = rng.uniform(size=(S, R, R, 3)).astype(np.float32)
        cfg = RunnerConfig(img_size=R, query_frame_num=1, max_query_pts=64,
                           query_method="harris", fine_tracking=False,
                           comple_nonvis=False, robust_refine=0, ba_iters=1,
                           visual_tracks=True, make_reproj_frames=True)
        runner = VGGSfMRunner(cfg)
        out_dir = str(tmp_path / "out")
        os.makedirs(out_dir, exist_ok=True)
        runner.sparse_reconstruct(
            images, image_names=[f"f{i}.png" for i in range(S)],
            output_dir=out_dir)
        vdir = os.path.join(out_dir, "visuals")
        assert os.path.exists(os.path.join(vdir, "tracks_0000.png"))
        assert os.path.exists(os.path.join(vdir, "tracks.gif"))
        assert os.path.exists(os.path.join(vdir, "reproj_0001.png"))

    def test_profiler_trace_capture(self, tmp_path):
        """profile_dir captures a JAX profiler trace with stage markers."""
        import glob

        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

        rng = np.random.default_rng(0)
        S, R = 2, 128
        images = rng.uniform(size=(S, R, R, 3)).astype(np.float32)
        prof_dir = str(tmp_path / "trace")
        cfg = RunnerConfig(img_size=R, query_frame_num=1, max_query_pts=64,
                           query_method="harris", fine_tracking=False,
                           comple_nonvis=False, robust_refine=0, ba_iters=1,
                           profile_dir=prof_dir)
        runner = VGGSfMRunner(cfg)
        preds = runner.sparse_reconstruct(images)
        assert set(preds["timings"]) >= {"query_rank", "camera_init",
                                         "fmaps", "tracking",
                                         "preliminary", "sfm"}
        traces = glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                           recursive=True)
        assert traces, f"no trace written under {prof_dir}"


@pytest.mark.slow
class TestExtraPoints:
    def test_triangulate_extra_points_shapes(self):
        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

        rng2 = np.random.default_rng(3)
        S, R = 3, 128
        images = jnp.asarray(
            rng2.uniform(size=(1, S, R, R, 3)).astype(np.float32))
        cfg = RunnerConfig(img_size=R, query_frame_num=1, max_query_pts=32,
                           query_method="harris", fine_tracking=False,
                           comple_nonvis=False)
        runner = VGGSfMRunner(cfg)
        fmaps = runner._fmaps(images)
        extr = np.tile(np.eye(3, 4, dtype=np.float32), (S, 1, 1))
        extr[:, 0, 3] = 0.2 * np.arange(S)
        intr = np.tile(np.array([[128.0, 0, 64], [0, 128, 64], [0, 0, 1]],
                                np.float32), (S, 1, 1))
        out = runner.triangulate_extra_points(
            images, fmaps, extr, intr, num_extra=64, by_neighbor=2)
        assert out["points3d"].shape[0] == out["valid"].shape[0]
        # every frame queries its own grid
        assert set(out["query_frame"]) == set(range(S))
        assert out["colors"].shape[1] == 3

    def test_extra_points_pipeline_and_export(self, tmp_path):
        """extra_pt_pixel_interval wires densification into the pipeline:
        predictions carry additional_points, the export writes the npz,
        and concat_extra_points appends trackless points to the model."""
        from vggsfm_tpu.io import read_model
        from vggsfm_tpu.runner import RunnerConfig, VGGSfMRunner

        rng2 = np.random.default_rng(4)
        S, R = 3, 128
        images = rng2.uniform(size=(S, R, R, 3)).astype(np.float32)
        cfg = RunnerConfig(img_size=R, query_frame_num=1, max_query_pts=64,
                           query_method="harris", fine_tracking=False,
                           comple_nonvis=False, robust_refine=0, ba_iters=1,
                           extra_pt_pixel_interval=16,
                           concat_extra_points=True)
        runner = VGGSfMRunner(cfg)
        out_dir = str(tmp_path / "out")
        os.makedirs(out_dir, exist_ok=True)
        preds = runner.sparse_reconstruct(
            images, image_names=[f"f{i}.png" for i in range(S)],
            output_dir=out_dir)
        extra = preds["additional_points"]
        assert extra is not None and "extra_points" in preds["timings"]
        assert extra["points3d"].shape[0] == S * (128 // 16) ** 2

        npz = np.load(os.path.join(out_dir, "additional_points.npz"))
        assert npz["additional_points_num"] == int(extra["valid"].sum())

        rec = read_model(os.path.join(out_dir, "sparse"))
        n_sfm = int((preds["valid_tracks"]).sum())
        assert len(rec.points3D) == n_sfm + int(extra["valid"].sum())
        # appended points are trackless
        trackless = [p for p in rec.points3D.values()
                     if len(p.image_ids) == 0]
        assert len(trackless) >= int(extra["valid"].sum())


class TestCameraInitCompetition:
    """The hybrid camera-init score must reject saturated-focal decodes.

    Regression (round 5): an untrained camera head whose focal saturates
    the pose-decode 0.2x clamp widened the normalized ray fan enough to
    inflate triangulation angles and outscore the sane two-view chain;
    BA then walked the focal from 0.2x to 2.27x GT and every pairwise
    rotation drifted ~0.7 deg/frame (light-config AUC 1.0 -> 0.84)."""

    def _planted(self, focal, seed=0):
        from vggsfm_tpu.geometry.cameras import build_intrinsics

        rng = np.random.default_rng(seed)
        S, N, sz = 4, 96, 512.0
        pts = rng.uniform(-1, 1, size=(N, 3)).astype(np.float32)
        pts[:, 2] += 4.0
        extr = np.zeros((S, 3, 4), np.float32)
        for i in range(S):
            a = 0.08 * i
            extr[i, :3, :3] = np.array(
                [[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                 [-np.sin(a), 0, np.cos(a)]], np.float32)
            extr[i, :, 3] = [0.3 * i, 0.0, 0.0]
        intr = np.asarray(build_intrinsics(
            jnp.full((S, 2), focal), jnp.full((S, 2), sz / 2)))
        cam = np.einsum("sij,nj->sni", extr[:, :, :3], pts) + extr[:, None, :, 3]
        uv = cam[..., :2] / cam[..., 2:3]
        tracks = np.einsum("sij,snj->sni", intr[:, :2, :2], uv) + \
            intr[:, None, :2, 2]
        return extr, intr, tracks.astype(np.float32)

    def test_saturated_focal_scores_below_any_support(self):
        from vggsfm_tpu.runner import _score_camera_init

        extr, intr_good, tracks = self._planted(focal=512.0)
        S, N = tracks.shape[:2]
        vis = jnp.ones((S, N), jnp.float32)
        fm = jnp.ones((S - 1, N), bool)
        scale = 512.0

        s_good = _score_camera_init(
            jnp.asarray(extr), jnp.asarray(intr_good), jnp.asarray(tracks),
            vis, fm, scale)
        assert int(s_good) > 0

        # same geometry claimed at the decode clamp floor: hard reject,
        # below even a zero-support competitor
        _, intr_sat, _ = self._planted(focal=0.2 * scale)
        s_sat = _score_camera_init(
            jnp.asarray(extr), jnp.asarray(intr_sat), jnp.asarray(tracks),
            vis, fm, scale)
        assert int(s_sat) == -1
        # ...and at the ceiling clamp too
        _, intr_hi, _ = self._planted(focal=5.0 * scale)
        s_hi = _score_camera_init(
            jnp.asarray(extr), jnp.asarray(intr_hi), jnp.asarray(tracks),
            vis, fm, scale)
        assert int(s_hi) == -1
