"""Camera model: OpenCV-convention pinhole cameras with radial distortion.

A camera is ``(extrinsic, intrinsic, extra_params)``:
  * ``extrinsic``:  (..., 3, 4) world->camera map ``[R | t]`` (OpenCV: x right,
    y down, z forward);
  * ``intrinsic``:  (..., 3, 3) ``[[fx,0,cx],[0,fy,cy],[0,0,1]]``;
  * ``extra_params``: (..., K) radial distortion, K in {1, 2, 4}
    (SIMPLE_RADIAL / RADIAL / OPENCV).

Behavioral parity: reference vggsfm/utils/triangulation_helpers.py:311-428
(projection & normalization), vggsfm/models/utils.py:38-201 (pose codec,
PyTorch3D->OpenCV conversion), vggsfm/utils/metric.py:233-302 (SE3 inverse).

All functions are pure, dtype-polymorphic and batch-polymorphic; on TPU the
hot paths keep everything in f32 (the reference upcasts to f64 around
projection — we instead rely on normalized camera coordinates, which keeps
conditioning tight enough for f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vggsfm_tpu.geometry.rotations import (
    matrix_to_quaternion,
    quaternion_to_matrix,
)
from vggsfm_tpu.geometry.distortion import apply_distortion, undistort_points

from vggsfm_tpu.utils.precision import f32_matmuls


def build_intrinsics(focal_length: jax.Array, principal_point: jax.Array) -> jax.Array:
    """(..., 2) focal + (..., 2) principal point -> (..., 3, 3) K matrix.

    Parity: triangulation_helpers.py:590-623 (`create_intri_matrix`).
    """
    fx, fy = focal_length[..., 0], focal_length[..., 1]
    cx, cy = principal_point[..., 0], principal_point[..., 1]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    K = jnp.stack([fx, zero, cx, zero, fy, cy, zero, zero, one], axis=-1)
    return K.reshape(focal_length.shape[:-1] + (3, 3))


@f32_matmuls
def se3_inverse(extrinsic: jax.Array) -> jax.Array:
    """Closed-form inverse of (..., 3, 4) or (..., 4, 4) world->cam transforms.

    Parity: utils/metric.py:233-302 (`closed_form_inverse_OpenCV`).
    Returns the same trailing shape as the input.
    """
    R = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3:4]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -Rt @ t
    top = jnp.concatenate([Rt, t_inv], axis=-1)
    if extrinsic.shape[-2] == 4:
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=extrinsic.dtype),
            top.shape[:-2] + (1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)
    return top


@f32_matmuls
def se3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose (..., 3, 4) transforms: result maps x -> a(b(x))."""
    Ra, ta = a[..., :3, :3], a[..., :3, 3:4]
    Rb, tb = b[..., :3, :3], b[..., :3, 3:4]
    R = Ra @ Rb
    t = Ra @ tb + ta
    return jnp.concatenate([R, t], axis=-1)


@f32_matmuls
def camera_centers(extrinsic: jax.Array) -> jax.Array:
    """Projection centers C = -Rᵀ t of (..., 3, 4) extrinsics -> (..., 3)."""
    R = extrinsic[..., :3, :3]
    t = extrinsic[..., :3, 3:]
    return -(jnp.swapaxes(R, -1, -2) @ t)[..., 0]


@f32_matmuls
def img_from_cam(
    intrinsics: jax.Array,
    points_cam: jax.Array,
    extra_params: jax.Array | None = None,
    default: float = 0.0,
) -> jax.Array:
    """Camera-space points (..., 3, N) -> pixel coords (..., N, 2).

    Parity: triangulation_helpers.py:358-395.
    """
    z = points_cam[..., 2:3, :]
    uv = points_cam[..., :2, :] / z
    if extra_params is not None:
        uu, vv = apply_distortion(extra_params, uv[..., 0, :], uv[..., 1, :])
        uv = jnp.stack([uu, vv], axis=-2)
    ones = jnp.ones_like(uv[..., :1, :])
    uvh = jnp.concatenate([uv, ones], axis=-2)
    pix = (intrinsics @ uvh)[..., :2, :]
    pix = jnp.nan_to_num(pix, nan=default, posinf=default, neginf=default)
    return jnp.swapaxes(pix, -1, -2)


@f32_matmuls
def project_points(
    points3D: jax.Array,
    extrinsics: jax.Array,
    intrinsics: jax.Array | None = None,
    extra_params: jax.Array | None = None,
    return_points_cam: bool = False,
    only_points_cam: bool = False,
):
    """Project world points (P, 3) through B cameras (B, 3, 4) -> (B, P, 2).

    Parity: triangulation_helpers.py:311-355 (`project_3D_points`); the
    reference runs this in f64 autocast — here computation stays in the input
    dtype (callers use f32) which tests show is within tolerance once the
    scene is normalized.
    """
    ones = jnp.ones_like(points3D[..., :1])
    homo = jnp.concatenate([points3D, ones], axis=-1)  # (P, 4)
    points_cam = extrinsics @ homo.T  # (B, 3, P)
    if only_points_cam:
        return points_cam
    points2D = img_from_cam(intrinsics, points_cam, extra_params)
    if return_points_cam:
        return points2D, points_cam
    return points2D


def cam_from_img(
    tracks: jax.Array,
    intrinsics: jax.Array,
    extra_params: jax.Array | None = None,
    undistort_iters: int = 25,
) -> jax.Array:
    """Pixel coords (..., N, 2) -> normalized camera coords, undistorting.

    Parity: triangulation_helpers.py:398-428 (`cam_from_img`).
    """
    pp = jnp.stack(
        [intrinsics[..., 0, 2], intrinsics[..., 1, 2]], axis=-1
    )[..., None, :]
    fl = jnp.stack(
        [intrinsics[..., 0, 0], intrinsics[..., 1, 1]], axis=-1
    )[..., None, :]
    normalized = (tracks - pp) / fl
    if extra_params is not None:
        normalized = undistort_points(
            extra_params, normalized, num_iters=undistort_iters
        )
    return normalized


# ---------------------------------------------------------------------------
# Pose encoding codec ("absT_quaR_OneFL", the camera predictor's output space)
# ---------------------------------------------------------------------------

def _pt3d_to_opencv(R: jax.Array, T: jax.Array):
    """PyTorch3D row-vector camera (R, T) -> OpenCV world->cam [R|t].

    Parity: models/utils.py:121-145. PT3D uses +x left / +y up row-vector
    convention; flipping the first two columns and transposing yields the
    OpenCV column-vector rotation.
    """
    flip = jnp.asarray([-1.0, -1.0, 1.0], dtype=R.dtype)
    R_cv = jnp.swapaxes(R * flip[None, None, :], -1, -2)
    T_cv = T * flip[None, :]
    return R_cv, T_cv


def _opencv_to_pt3d(R: jax.Array, T: jax.Array):
    """Inverse of `_pt3d_to_opencv`."""
    flip = jnp.asarray([-1.0, -1.0, 1.0], dtype=R.dtype)
    R_pt = jnp.swapaxes(R, -1, -2) * flip[None, None, :]
    T_pt = T * flip[None, :]
    return R_pt, T_pt


@f32_matmuls
def pose_encoding_to_extri_intri(
    pose_encoding: jax.Array,
    image_size_hw: jax.Array,
    min_focal_length: float = 0.1,
    max_focal_length: float = 30.0,
    relative_to_first: bool = True,
):
    """Decode (S, 8) `absT_quaR_OneFL` encodings to OpenCV cameras.

    Returns (extrinsics (S,3,4), intrinsics (S,3,3)).

    Parity chain: models/utils.py:108-153 (`pose_encoding_to_camera` with
    to_OpenCV=True) followed by models/utils.py:38-72 (`get_EFP`): the focal
    is a single normalized dof, scaled by min(H, W) and clamped to
    [0.2, 5] x scale; the principal point is the image center; all cameras
    are expressed relative to camera 0.
    """
    abs_T = pose_encoding[..., :3]
    quat = pose_encoding[..., 3:7]
    focal_norm = jnp.clip(
        pose_encoding[..., 7:8], min_focal_length, max_focal_length
    )

    R = quaternion_to_matrix(quat)
    R_cv, T_cv = _pt3d_to_opencv(R, abs_T)
    extrinsics = jnp.concatenate([R_cv, T_cv[..., None]], axis=-1)

    if relative_to_first:
        first_inv = se3_inverse(extrinsics[..., 0, :, :])
        # OpenCV convention: world'->cam_i = (world->cam_i) ∘ (cam_0->world)
        extrinsics = se3_compose(extrinsics, first_inv[..., None, :, :])

    hw = jnp.asarray(image_size_hw, dtype=pose_encoding.dtype)
    scale = jnp.min(hw)
    focal_px = jnp.clip(focal_norm * scale / 2.0, 0.2 * scale, 5.0 * scale)
    focal_px = jnp.broadcast_to(focal_px, pose_encoding.shape[:-1] + (2,))
    pp = jnp.broadcast_to(
        hw[::-1] / 2.0, pose_encoding.shape[:-1] + (2,)
    )
    intrinsics = build_intrinsics(focal_px, pp)
    return extrinsics, intrinsics


@f32_matmuls
def extri_intri_to_pose_encoding(
    extrinsics: jax.Array,
    intrinsics: jax.Array,
    image_size_hw: jax.Array,
    min_focal_length: float = 0.1,
    max_focal_length: float = 30.0,
) -> jax.Array:
    """Inverse of `pose_encoding_to_extri_intri` (up to the first-camera gauge).

    Parity: models/utils.py:156-201 (`camera_to_pose_encoding`,
    absT_quaR_OneFL branch).
    """
    R_pt, T_pt = _opencv_to_pt3d(
        extrinsics[..., :3, :3], extrinsics[..., :3, 3]
    )
    quat = matrix_to_quaternion(R_pt)
    hw = jnp.asarray(image_size_hw, dtype=extrinsics.dtype)
    scale = jnp.min(hw)
    focal_px = (intrinsics[..., 0, 0] + intrinsics[..., 1, 1]) / 2.0
    focal_norm = jnp.clip(
        focal_px * 2.0 / scale, min_focal_length, max_focal_length
    )
    return jnp.concatenate([T_pt, quat, focal_norm[..., None]], axis=-1)
