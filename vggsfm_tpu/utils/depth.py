"""Dense-depth utilities: disparity-to-SfM alignment + COLMAP depth maps.

Parity: vggsfm/utils/utils.py:603-770 (monocular disparity aligned to the
sparse reconstruction with a robust linear fit — the reference uses
sklearn's RANSACRegressor) and :340-390 (COLMAP `.bin` depth-map
`read_array`/`write_array`: an ASCII "width&height&channels&" header
followed by row-major float32 data).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def align_disparity_to_depth(disparity: jax.Array, sparse_depth: jax.Array,
                             valid: jax.Array, key: jax.Array,
                             num_trials: int = 256):
    """Fit depth ~ 1 / (a * disparity + b) robustly (RANSAC on 2-point fits).

    Args:
      disparity: (N,) monocular disparities sampled at sparse points.
      sparse_depth: (N,) SfM depths at the same points.
      valid: (N,) usable samples.

    Returns (a, b, inlier_mask). Parity: utils/utils.py:603-770, with the
    sklearn RANSACRegressor replaced by a fixed-budget vectorized RANSAC
    over inverse-depth: 1/depth = a * disp + b.
    """
    inv_depth = 1.0 / jnp.maximum(sparse_depth, 1e-6)
    N = disparity.shape[0]
    idx = jax.random.randint(key, (num_trials, 2), 0, N)
    d0 = jnp.take(disparity, idx[:, 0])
    d1 = jnp.take(disparity, idx[:, 1])
    y0 = jnp.take(inv_depth, idx[:, 0])
    y1 = jnp.take(inv_depth, idx[:, 1])
    denom = jnp.where(jnp.abs(d1 - d0) < 1e-9, 1e-9, d1 - d0)
    a = (y1 - y0) / denom
    b = y0 - a * d0

    pred = a[:, None] * disparity[None, :] + b[:, None]
    err = jnp.abs(pred - inv_depth[None, :])
    scale = jnp.maximum(jnp.abs(inv_depth[None, :]), 1e-6)
    inl = (err / scale < 0.1) & valid[None, :]
    num = jnp.sum(inl, axis=1)
    best = jnp.argmax(num)
    mask = inl[best]

    # least-squares refit on the best trial's inliers
    w = mask.astype(jnp.float32)
    sw = jnp.maximum(jnp.sum(w), 1.0)
    mx = jnp.sum(w * disparity) / sw
    my = jnp.sum(w * inv_depth) / sw
    cov = jnp.sum(w * (disparity - mx) * (inv_depth - my))
    var = jnp.maximum(jnp.sum(w * (disparity - mx) ** 2), 1e-12)
    a_fit = cov / var
    b_fit = my - a_fit * mx
    return a_fit, b_fit, mask


def align_depth_maps_to_sfm(disparity, extrinsics, points3d, tracks,
                            obs_mask, key):
    """Per-frame disparity -> metric depth maps, aligned to SfM points.

    The in-graph, whole-batch form of the reference's per-image loop
    (utils/utils.py:603-770 `align_dense_depth_maps`): for every frame,
    sample the monocular disparity at the 2D observations of valid 3D
    points, robust-fit 1/depth = a * disp + b against the SfM depths, and
    apply the fit to the full map.

    Args:
      disparity: (S, H, W) relative disparity maps.
      extrinsics: (S, 3, 4) world-to-camera.
      points3d: (N, 3).
      tracks: (S, N, 2) pixel observations.
      obs_mask: (S, N) valid observations of valid tracks.

    Returns (depth_maps (S, H, W), a (S,), b (S,), inlier_frac (S,)).
    """
    from vggsfm_tpu.models.sampling import bilinear_sample

    S = disparity.shape[0]
    cam_pts = jnp.einsum("sij,nj->sni", extrinsics[:, :, :3],
                         points3d) + extrinsics[:, None, :, 3]
    sfm_depth = cam_pts[..., 2]  # (S, N)
    valid = obs_mask & (sfm_depth > 1e-4)

    disp_sparse = bilinear_sample(disparity[..., None], tracks,
                                  padding_mode="border")[..., 0]

    def one(d_sparse, z, v, k, dmap):
        a, b, mask = align_disparity_to_depth(d_sparse, z, v, k)
        return (disparity_to_depth_map(dmap, a, b), a, b,
                jnp.sum(mask) / jnp.maximum(jnp.sum(v), 1))

    keys = jax.random.split(key, S)
    return jax.vmap(one)(disp_sparse, sfm_depth, valid, keys, disparity)


def disparity_to_depth_map(disparity_map: jax.Array, a, b):
    """Apply the fitted transform: depth = 1 / max(a * disp + b, eps)."""
    return 1.0 / jnp.maximum(a * disparity_map + b, 1e-6)


def write_colmap_array(path: str, array: np.ndarray) -> None:
    """COLMAP depth/normal map format (utils/utils.py:359-390)."""
    array = np.asarray(array, np.float32)
    if array.ndim == 2:
        array = array[..., None]
    h, w, c = array.shape
    with open(path, "wb") as f:
        f.write(f"{w}&{h}&{c}&".encode())
        f.write(array.transpose(2, 0, 1).reshape(-1).astype(
            "<f4").tobytes())


def read_colmap_array(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        header = b""
        amps = 0
        while amps < 3:
            ch = f.read(1)
            header += ch
            if ch == b"&":
                amps += 1
        w, h, c = (int(x) for x in header.decode()[:-1].split("&"))
        data = np.frombuffer(f.read(), "<f4")
    out = data.reshape(c, h, w).transpose(1, 2, 0)
    return out[..., 0] if c == 1 else out
