"""Pure-JAX geometric substrate: rotations, cameras, distortion, alignment.

Functional equivalents of the reference's `minipytorch3d/` + camera utils
(reference: minipytorch3d/rotation_conversions.py, vggsfm/utils/
triangulation_helpers.py, vggsfm/utils/distortion.py, vggsfm/utils/align.py),
re-designed as shape-polymorphic, jit/vmap-friendly functions.
"""

from vggsfm_tpu.geometry.rotations import (
    quaternion_to_matrix,
    matrix_to_quaternion,
    standardize_quaternion,
    quaternion_multiply,
    quaternion_invert,
    axis_angle_to_matrix,
    so3_geodesic_angle,
)
from vggsfm_tpu.geometry.cameras import (
    build_intrinsics,
    se3_inverse,
    camera_centers,
    project_points,
    img_from_cam,
    cam_from_img,
    pose_encoding_to_extri_intri,
    extri_intri_to_pose_encoding,
)
from vggsfm_tpu.geometry.distortion import (
    apply_distortion,
    undistort_points,
)
from vggsfm_tpu.geometry.alignment import (
    align_camera_extrinsics,
    apply_transformation,
)
