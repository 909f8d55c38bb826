"""SfM solver orchestration: init pair -> BA -> refine -> iterative BA.

The TPU equivalent of the reference's Triangulator module
(vggsfm/models/triangulator.py) and its pose-refinement helpers
(vggsfm/utils/triangulation.py:260-647): a host-side state machine whose
every step is a jitted device kernel, with *dense masked arrays* (fixed N)
instead of the reference's dynamic filtering — compaction happens once, at
COLMAP export.
"""

from vggsfm_tpu.sfm.triangulator import SfmConfig, run_sfm
from vggsfm_tpu.sfm.refine import refine_poses
