from wseg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
)
from wseg_tpu.parallel.optim import (  # noqa: F401
    label_params,
    make_optimizer,
    lr_multipliers,
)
