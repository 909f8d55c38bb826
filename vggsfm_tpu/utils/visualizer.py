"""Track visualization: PNG frames, animated GIF, and mp4 video.

Parity: vggsfm/utils/visualizer.py:62-371 draws tracked points on each
frame and writes an mp4; here frames render through PIL with
rainbow-indexed track colors, export as per-frame PNGs + an animated
GIF, and — when OpenCV's VideoWriter has a working codec (mp4v verified
in this image; MJPG .avi as fallback) — the reference's mp4 as well.
Also covers the reprojection overlay of utils/utils.py:428-571:
projected 3D points drawn against their 2D tracks.
"""

from __future__ import annotations

import os

import numpy as np


def write_video(frames: list, path: str, fps: int = 5) -> str | None:
    """Encode RGB uint8 frames to video via cv2.VideoWriter.

    Tries the container/codec implied by `path` (mp4 -> mp4v), falls
    back to MJPG .avi, returns the written path or None when no codec
    is available (callers always also have PNG/GIF outputs).
    """
    if not frames:
        return None
    try:
        import cv2
    except ImportError:
        return None
    h, w = frames[0].shape[:2]
    candidates = [(path, "mp4v" if path.endswith(".mp4") else "MJPG")]
    if path.endswith(".mp4"):
        candidates.append((path[:-4] + ".avi", "MJPG"))
    for p, codec in candidates:
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*codec), fps,
                             (w, h))
        if not vw.isOpened():
            continue
        for f in frames:
            vw.write(f[..., ::-1])  # RGB -> BGR
        vw.release()
        return p
    return None


def _colormap(n: int) -> np.ndarray:
    """(n, 3) uint8 rainbow colors by track index."""
    t = np.linspace(0.0, 1.0, max(n, 2))
    r = np.clip(1.5 - np.abs(3 * t - 1.5), 0, 1)
    g = np.clip(1.5 - np.abs(3 * t - 0.75) * 2, 0, 1)
    b = np.clip(1.5 - np.abs(3 * t) * 2 + 1.0, 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def draw_points(image: np.ndarray, xy: np.ndarray, colors: np.ndarray,
                radius: int = 2, valid: np.ndarray | None = None):
    """Stamp colored squares at xy on a copy of (H, W, 3) uint8 image."""
    out = image.copy()
    H, W = out.shape[:2]
    if valid is None:
        valid = np.ones(len(xy), bool)
    for (x, y), c, ok in zip(np.asarray(xy), colors, valid):
        if not ok:
            continue
        xi, yi = int(round(x)), int(round(y))
        if 0 <= xi < W and 0 <= yi < H:
            y0, y1 = max(0, yi - radius), min(H, yi + radius + 1)
            x0, x1 = max(0, xi - radius), min(W, xi + radius + 1)
            out[y0:y1, x0:x1] = c
    return out


def visualize_query_points(image: np.ndarray, xy: np.ndarray,
                           path: str, valid: np.ndarray | None = None,
                           radius: int = 4):
    """Save one frame with its extracted query points stamped green.

    Parity: utils/utils.py:311-338 (`visual_query_points` — the
    reference's cv2.circle debug overlay; squares here, no cv2 in-env).
    `image` is (H, W, 3) float [0,1] or uint8; `xy` is (N, 2) pixels.
    """
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
    colors = np.tile(np.array([[0, 255, 0]], np.uint8), (len(xy), 1))
    out = draw_points(img, xy, colors, radius=radius, valid=valid)
    Image.fromarray(out).save(path)
    return path


def visualize_tracks(images: np.ndarray, tracks: np.ndarray,
                     visibility: np.ndarray | None, output_dir: str,
                     prefix: str = "tracks", gif: bool = True,
                     max_tracks: int = 256) -> list:
    """Render tracked points over every frame.

    Args:
      images: (S, H, W, 3) float [0,1] or uint8.
      tracks: (S, N, 2); visibility: optional (S, N).

    Writes `<prefix>_####.png` per frame, `<prefix>.gif`, and
    `<prefix>.mp4` (reference parity, visualizer.py:87-135; skipped only
    if no cv2 codec works); returns the written paths.
    """
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    imgs = np.asarray(images)
    if imgs.dtype != np.uint8:
        imgs = np.clip(imgs * 255, 0, 255).astype(np.uint8)
    S, H, W, _ = imgs.shape
    N = min(tracks.shape[1], max_tracks)
    colors = _colormap(N)

    paths = []
    frames = []
    for s in range(S):
        valid = None
        if visibility is not None:
            valid = np.asarray(visibility[s, :N]) > 0.05
        frame = draw_points(imgs[s], tracks[s, :N], colors, valid=valid)
        p = os.path.join(output_dir, f"{prefix}_{s:04d}.png")
        Image.fromarray(frame).save(p)
        paths.append(p)
        frames.append(frame)
    if gif and frames:
        gp = os.path.join(output_dir, f"{prefix}.gif")
        pil = [Image.fromarray(f) for f in frames]
        pil[0].save(gp, save_all=True, append_images=pil[1:],
                    duration=200, loop=0)
        paths.append(gp)
    vp = write_video(frames, os.path.join(output_dir, f"{prefix}.mp4"))
    if vp:
        paths.append(vp)
    return paths


def visualize_reprojections(images: np.ndarray, tracks: np.ndarray,
                            points3d: np.ndarray, extrinsics: np.ndarray,
                            intrinsics: np.ndarray, valid_tracks: np.ndarray,
                            output_dir: str, extra_params=None) -> list:
    """Overlay observed tracks (colored) and reprojected 3D points (white).

    Parity: utils/utils.py:428-571 (`create_video_with_reprojections`).
    `extra_params` (radial distortion) must be passed for SIMPLE_RADIAL
    models — the observations live in distorted pixel space.
    """
    from vggsfm_tpu.geometry.cameras import project_points
    import jax.numpy as jnp

    proj = np.asarray(project_points(
        jnp.asarray(points3d), jnp.asarray(extrinsics),
        jnp.asarray(intrinsics),
        extra_params=(None if extra_params is None
                      else jnp.asarray(extra_params))))
    imgs = np.asarray(images)
    if imgs.dtype != np.uint8:
        imgs = np.clip(imgs * 255, 0, 255).astype(np.uint8)
    S = imgs.shape[0]
    N = min(tracks.shape[1], 256)
    colors = _colormap(N)
    white = np.full((N, 3), 255, np.uint8)

    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    paths = []
    frames = []
    for s in range(S):
        frame = draw_points(imgs[s], tracks[s, :N], colors,
                            valid=np.asarray(valid_tracks[:N]))
        frame = draw_points(frame, proj[s, :N], white, radius=1,
                            valid=np.asarray(valid_tracks[:N]))
        p = os.path.join(output_dir, f"reproj_{s:04d}.png")
        Image.fromarray(frame).save(p)
        paths.append(p)
        frames.append(frame)
    # the reference's reprojection VIDEO (utils/utils.py:428-571)
    vp = write_video(frames, os.path.join(output_dir, "reproj.mp4"))
    if vp:
        paths.append(vp)
    return paths
