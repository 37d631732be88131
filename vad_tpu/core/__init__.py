from vad_tpu.core.config import ImageAEConfig, VideoAEConfig  # noqa: F401
