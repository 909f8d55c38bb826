"""Sequential (video) reconstruction: windowed incremental SfM.

Parity: vggsfm/runners/video_runner.py — an initial sparse solve on the
first window, then per-window: track existing 3D points + fresh query
points into the new frames, register the new frames against the fixed map
(PnP + pose refinement), triangulate new points, run windowed BA with old
poses/points frozen, and periodically a joint BA over everything solved by
the sparse implicit-Schur LM (vggsfm_tpu.ba.sparse_lm) instead of CPU
Ceres (video_runner.py:1321-1331).
"""

from vggsfm_tpu.video.runner import VideoRunner, VideoConfig
