from wseg_tpu.engine.train_loop import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
