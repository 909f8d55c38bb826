"""Dataset loaders (host-side, PIL + numpy)."""

from vggsfm_tpu.datasets.demo_loader import DemoLoader, pad_and_resize_image
