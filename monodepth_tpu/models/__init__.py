"""Model zoo: ViT backbone, depth encoder/decoder, standard + enhanced assemblies.

All modules are flax.linen, NHWC layout, and numerically mirror the PyTorch
reference's behavior (SURVEY.md §2) while being fresh TPU-first implementations.
"""

from monodepth_tpu.models.vit import VisionTransformer  # noqa: F401
from monodepth_tpu.models.encoder import DepthAnythingEncoder  # noqa: F401
from monodepth_tpu.models.decoder import DepthAnythingDecoder  # noqa: F401
from monodepth_tpu.models.model import DepthAnything, disp_scale_factor  # noqa: F401
from monodepth_tpu.models.enhanced import EnhancedDepthAnything  # noqa: F401
