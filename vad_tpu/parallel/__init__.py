from vad_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    get_mesh,
    pad_batch_for_devices,
    replicate_sharding,
)
