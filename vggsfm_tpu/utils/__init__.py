"""Shared utilities: precision control, chunking, misc helpers."""

from vggsfm_tpu.utils.precision import f32_matmuls
