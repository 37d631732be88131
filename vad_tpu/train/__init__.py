from vad_tpu.train.state import (  # noqa: F401
    ReduceLROnPlateau,
    TrainState,
    create_train_state,
    current_learning_rate,
    set_learning_rate,
)
