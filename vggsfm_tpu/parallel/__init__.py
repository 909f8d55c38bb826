"""Multi-chip scaling: device meshes + sharded pipeline steps.

The reference is strictly single-GPU (SURVEY §2.3) and scales only by
host-side chunking; here the same axes become mesh axes:

  * ``points`` — query tracks: the tracker, triangulation LORANSAC and the
    BA point blocks are embarrassingly parallel per track; XLA/GSPMD
    inserts the collectives the factored space-attention and the reduced
    camera system need (all-gather of virtual-track tokens, psum of
    per-camera Hessian blocks over ICI);
  * ``frames`` — images: CNN feature extraction and per-frame pose
    refinement are independent per frame.
"""

from vggsfm_tpu.parallel.mesh import make_mesh, shard_spec
from vggsfm_tpu.parallel.sharded import (
    sharded_pipeline_step,
    sharded_track_and_reconstruct,
)
