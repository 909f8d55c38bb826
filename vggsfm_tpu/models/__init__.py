"""Neural models: track predictor, camera predictor, backbones (Flax).

TPU-native re-implementations of the reference's model zoo
(vggsfm/models/): CoTracker-style iterative track transformer, DINOv2-based
camera pose regressor, and the CNN feature encoders. All modules are
channels-last (NHWC — the TPU conv layout), pure-functional Flax, and keep
bf16-friendly matmuls in the neural path (geometry stays f32).
"""

from vggsfm_tpu.models.tracker import BaseTrackerPredictor, TrackerPredictor
from vggsfm_tpu.models.encoders import BasicEncoder, ShallowEncoder
from vggsfm_tpu.models.camera import CameraPredictor
from vggsfm_tpu.models.dinov2 import DinoVisionTransformer
