"""Query-point extractors.

The reference dispatches to LightGlue's SuperPoint / ALIKED / SIFT
(vggsfm/runners/runner.py:1336-1416) to pick query keypoints on the query
frame. Here:

  * ``sift`` -> a pure-JAX difference-of-Gaussians scale-space detector
    (vggsfm_tpu.extractors.dog) — classical, no weights;
  * ``harris`` -> Harris corner response, as a cheap fallback;
  * ``aliked`` / ``superpoint`` -> Flax CNN ports (weights converted from
    the public checkpoints when available; random weights otherwise).
  * ``grid`` -> uniform grid (the reference's extra-point fallback,
    runner.py:1379-1384 uses random when extractors fail).
"""

from vggsfm_tpu.extractors.dog import detect_dog_keypoints
from vggsfm_tpu.extractors.corners import detect_harris_keypoints
from vggsfm_tpu.extractors.dispatch import get_query_points
