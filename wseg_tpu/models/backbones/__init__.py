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


def get_backbone(name: str, dtype, module_name=None):
    """Backbone factory keyed by the reference cfg.NET.BACKBONE strings."""
    kw = {"dtype": dtype}
    if module_name is not None:
        kw["name"] = module_name
    if name == "resnet38":
        return ResNet38(**kw)
    if name == "resnet50":
        return ResNet(layers=(3, 4, 6, 3), **kw)
    if name == "resnet101":
        return ResNet(layers=(3, 4, 23, 3), **kw)
    if name == "vgg16":
        return VGG16(**kw)
    raise NotImplementedError(f"No backbone found for '{name}'")
