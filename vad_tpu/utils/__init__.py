from vad_tpu.utils.checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from vad_tpu.utils.export import (  # noqa: F401
    export_from_checkpoint,
    load_artifact,
    save_artifact,
)
