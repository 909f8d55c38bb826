"""Reconstruction data model + COLMAP-format IO (host-side).

Replaces the reference's dependency on `pycolmap.Reconstruction` for data
interchange (vggsfm/utils/tensor_to_pycolmap.py) and `.write()` for COLMAP
binary export (runners/runner.py:905-911). The on-disk format follows the
public COLMAP sparse-model spec (cameras.bin / images.bin / points3D.bin,
plus the text variants).
"""

from vggsfm_tpu.io.colmap import (
    Camera,
    Image,
    Point3D,
    Reconstruction,
    CAMERA_MODELS,
    read_model,
    write_model,
)
from vggsfm_tpu.io.bridge import (
    arrays_to_reconstruction,
    reconstruction_to_arrays,
)
