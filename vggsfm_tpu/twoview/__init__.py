"""Two-view geometry: batched robust estimators for F/E and relative pose.

TPU-native redesign of the reference ``vggsfm/two_view_geo`` package: every
estimator is a fixed-budget batched computation (vmap over trials + top_k
selection) with no data-dependent control flow, and the per-pair axis is a
natural mesh-sharding axis.
"""

from vggsfm_tpu.twoview.utils import (
    normalize_points_masked,
    sampson_epipolar_distance,
    generate_samples,
)
from vggsfm_tpu.twoview.fundamental import (
    run_7point,
    run_8point,
    estimate_fundamental,
)
from vggsfm_tpu.twoview.essential import (
    essential_from_fundamental,
    decompose_essential_matrix,
    remove_cheirality,
)
from vggsfm_tpu.twoview.preliminary import estimate_preliminary_cameras
from vggsfm_tpu.twoview.five_point import run_5point, estimate_essential
from vggsfm_tpu.twoview.pnp import absolute_pose_ransac, solve_pnp_dlt
from vggsfm_tpu.twoview.homography import (
    estimate_homography,
    decompose_homography_matrix,
    run_homography_dlt,
)
