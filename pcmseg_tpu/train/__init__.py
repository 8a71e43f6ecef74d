from pcmseg_tpu.train.steps import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    set_learning_rate,
    get_learning_rate,
)
