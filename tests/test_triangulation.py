import jax.numpy as jnp
import numpy as np

from vggsfm_tpu.geometry import build_intrinsics, project_points, cam_from_img
from vggsfm_tpu.ops.triangulation import (
    multiview_dlt,
    triangulate_by_pair,
    triangulate_tracks,
    triangulation_angles,
    cheirality_invalid,
    filter_points3d,
)


def make_scene(rng, S=8, N=64, noise=0.0, radius=4.0):
    """Camera ring looking at origin + gaussian point cloud."""
    angles = np.linspace(0, 2 * np.pi, S, endpoint=False)
    Rs, ts = [], []
    for a in angles:
        C = np.array(
            [radius * np.cos(a), 0.5 * np.sin(2 * a), radius * np.sin(a)]
        )
        z = -C / np.linalg.norm(C)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=0)
        Rs.append(R)
        ts.append(-R @ C)
    extr = np.concatenate([np.stack(Rs), np.stack(ts)[..., None]], axis=-1)
    pts = rng.normal(size=(N, 3)) * 0.5
    K = np.asarray(
        build_intrinsics(jnp.full((S, 2), 600.0), jnp.full((S, 2), 512.0))
    )
    p2d = np.asarray(
        project_points(jnp.asarray(pts), jnp.asarray(extr), jnp.asarray(K))
    )
    if noise:
        p2d = p2d + rng.normal(size=p2d.shape) * noise
    tracks_norm = np.asarray(cam_from_img(jnp.asarray(p2d), jnp.asarray(K)))
    return (
        jnp.asarray(extr, dtype=jnp.float32),
        jnp.asarray(K, dtype=jnp.float32),
        jnp.asarray(pts, dtype=jnp.float32),
        jnp.asarray(p2d, dtype=jnp.float32),
        jnp.asarray(tracks_norm, dtype=jnp.float32),
    )


def test_multiview_dlt_exact(rng):
    extr, K, pts, p2d, tracks = make_scene(rng)
    S, N = tracks.shape[0], tracks.shape[1]
    cams = jnp.broadcast_to(extr[None], (N, S, 3, 4))
    pts_nt = jnp.swapaxes(tracks, 0, 1)  # (N, S, 2)
    recon = multiview_dlt(cams, pts_nt)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(pts), atol=2e-3)


def test_multiview_dlt_masked(rng):
    extr, K, pts, p2d, tracks = make_scene(rng)
    S, N = tracks.shape[0], tracks.shape[1]
    cams = jnp.broadcast_to(extr[None], (N, S, 3, 4))
    pts_nt = jnp.swapaxes(tracks, 0, 1)
    # corrupt half the views but mask them out
    mask = np.ones((N, S), dtype=np.float32)
    mask[:, S // 2:] = 0.0
    corrupted = np.asarray(pts_nt).copy()
    corrupted[:, S // 2:] += 10.0
    recon = multiview_dlt(cams, jnp.asarray(corrupted), mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(recon), np.asarray(pts), atol=5e-3)


def test_triangulate_by_pair(rng):
    extr, K, pts, p2d, tracks = make_scene(rng)
    points3d, che_mask, tri_angles = triangulate_by_pair(extr, tracks)
    assert points3d.shape == (extr.shape[0] - 1, tracks.shape[1], 3)
    assert bool(jnp.all(che_mask))
    err = np.linalg.norm(np.asarray(points3d - pts[None]), axis=-1)
    # pairs with decent triangulation angle must be accurate; the
    # near-diametric pair (rays almost collinear at the point) is expected
    # to be ill-conditioned and is exactly what tri_angles gates downstream
    good = np.asarray(tri_angles) > 15.0
    assert good.sum() > good.size // 2
    assert err[good].max() < 5e-3


def test_cheirality(rng):
    extr, K, pts, p2d, tracks = make_scene(rng)
    S, N = tracks.shape[0], tracks.shape[1]
    cams = jnp.broadcast_to(extr[None], (N, S, 3, 4))
    behind = jnp.full((N, 3), 100.0)  # far outside the ring
    inv = cheirality_invalid(cams, behind)
    assert bool(jnp.any(inv))
    ok = cheirality_invalid(cams, pts)
    assert not bool(jnp.any(ok))


def test_triangulate_tracks_with_outliers(rng):
    extr, K, pts, p2d, tracks = make_scene(rng, S=10, N=48, noise=0.3)
    S, N = tracks.shape[0], tracks.shape[1]
    # plant gross outliers in 3 frames for each track
    corrupted = np.asarray(tracks).copy()
    bad_frames = [2, 5, 7]
    corrupted[bad_frames] += 0.5  # large normalized-coords offset
    vis = jnp.ones((S, N))
    score = jnp.ones((S, N))
    points3d, inlier_num, inlier_mask = triangulate_tracks(
        extr, jnp.asarray(corrupted), track_vis=vis, track_score=score,
        max_ransac_iters=64, lo_num=20,
    )
    err = np.linalg.norm(np.asarray(points3d) - np.asarray(pts), axis=-1)
    assert np.median(err) < 0.02
    # outlier frames must be excluded from the inlier mask for most tracks
    im = np.asarray(inlier_mask)
    assert im[:, bad_frames].mean() < 0.2
    assert im[:, [0, 1, 3]].mean() > 0.8


def test_triangulate_tracks_vis_gating(rng):
    extr, K, pts, p2d, tracks = make_scene(rng, S=6, N=16)
    S, N = tracks.shape[0], tracks.shape[1]
    vis = np.ones((S, N), dtype=np.float32)
    vis[4:] = 0.01  # low visibility -> those frames must not be inliers
    points3d, inlier_num, inlier_mask = triangulate_tracks(
        extr, tracks, track_vis=jnp.asarray(vis), max_ransac_iters=16, lo_num=8
    )
    assert not bool(jnp.any(inlier_mask[:, 4:]))
    err = np.linalg.norm(np.asarray(points3d) - np.asarray(pts), axis=-1)
    assert np.median(err) < 1e-2


def test_filter_points3d(rng):
    extr, K, pts, p2d, tracks = make_scene(rng, S=6, N=32)
    valid, detail = filter_points3d(pts, p2d, extr, K)
    assert bool(jnp.all(valid))
    # push half the points far away -> reprojections break
    bad_pts = np.asarray(pts).copy()
    bad_pts[:16] += 5.0
    valid2, _ = filter_points3d(jnp.asarray(bad_pts), p2d, extr, K)
    assert not bool(jnp.any(valid2[:16]))
    assert bool(jnp.all(valid2[16:]))


def test_triangulation_angles_geometry():
    # two cameras at 90 degrees around origin, point at origin
    # centers at (0,0,-2) and (2,0,0): rays to the origin meet at 90 degrees
    extr = jnp.asarray(
        [
            [[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.0]],
            [[1.0, 0, 0, -2.0], [0, 1, 0, 0], [0, 0, 1, 0]],
        ]
    )
    ang = triangulation_angles(extr[None], jnp.zeros((1, 3)))
    np.testing.assert_allclose(float(ang[0, 0, 1]), 90.0, atol=1e-3)
