from wseg_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    rescale_as,
)
from wseg_tpu.ops.pooling import (  # noqa: F401
    focal_penalty,
    ngwp_pool,
    ngwp_focal_scores,
)
from wseg_tpu.ops.pseudo_mask import (  # noqa: F401
    pseudo_gtmask,
    balanced_mask_loss_ce,
)
from wseg_tpu.ops.sg import stochastic_gate  # noqa: F401
from wseg_tpu.ops.pamr import pamr, pamr_affinity, pamr_propagate  # noqa: F401
