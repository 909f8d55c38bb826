"""In-graph bundle adjustment: batched Levenberg-Marquardt with Schur trick.

Replaces the reference's CPU Ceres round-trips
(pycolmap.bundle_adjustment at vggsfm/utils/triangulation.py:213,1050,1142
and pyceres at runners/video_runner.py:1321-1331) with a jit-able,
differentiable LM solver that runs entirely on device. Parameter freezing
(gauge fixing, the video runner's constant poses/points) is Jacobian
masking; multi-chip BA shards points over the mesh and psums the reduced
camera system (see vggsfm_tpu.parallel).
"""

from vggsfm_tpu.ba.lm import BAConfig, bundle_adjust, reprojection_cost
from vggsfm_tpu.ba.sparse_lm import SparseBAConfig, bundle_adjust_sparse
