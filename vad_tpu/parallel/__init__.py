from vad_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    convlstm_param_shardings,
    get_mesh,
    opt_state_shardings,
    pad_batch_for_devices,
    replicate_sharding,
    train_state_shardings,
)
