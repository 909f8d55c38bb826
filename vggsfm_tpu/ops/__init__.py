"""Batched geometry compute ops: eigensolvers, triangulation, RANSAC solvers.

TPU-native equivalents of the reference's `vggsfm/two_view_geo/` +
`vggsfm/utils/triangulation*.py` GPU layer. Everything here is jit/vmap-safe
with static shapes; RANSAC uses fixed trial budgets and mask-based selection.
"""

from vggsfm_tpu.ops.eigh import eigh_small, smallest_eigenvector
