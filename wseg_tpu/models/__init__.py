from wseg_tpu.models.stage_net import (  # noqa: F401
    MODEL_SPECS,
    HeadSpec,
    ModelOutput,
    StageNet,
    get_model,
)
from wseg_tpu.models.backbones import get_backbone  # noqa: F401
