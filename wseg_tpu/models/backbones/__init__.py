from wseg_tpu.models.backbones.common import (  # noqa: F401
    AffineNorm,
    FrozenBatchNorm,
    conv,
    denormalize_image,
    normalize_image,
)
from wseg_tpu.models.backbones.resnet import (  # noqa: F401
    ResNet,
    ResNet50,
    ResNet101,
)
from wseg_tpu.models.backbones.resnet38 import ResNet38  # noqa: F401
from wseg_tpu.models.backbones.vgg16 import VGG16  # noqa: F401


def get_backbone(name: str, dtype):
    """Backbone factory keyed by the reference cfg.NET.BACKBONE strings."""
    if name == "resnet38":
        return ResNet38(dtype=dtype)
    if name == "resnet50":
        return ResNet50(dtype=dtype)
    if name == "resnet101":
        return ResNet101(dtype=dtype)
    if name == "vgg16":
        return VGG16(dtype=dtype)
    raise NotImplementedError(f"No backbone found for '{name}'")
