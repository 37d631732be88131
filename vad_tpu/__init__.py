"""vad_tpu — TPU-native video/image anomaly detection framework.

A ground-up JAX / Flax / Pallas re-design of the capabilities of
KuldeepChoksi/video-anomaly-detection (reference mounted at /root/reference):

- Convolutional autoencoder for industrial *images* (MVTec AD format),
  reference models/autoencoder.py.
- ConvLSTM autoencoder for industrial *video* (IPAD / generic videos),
  reference models/video_autoencoder.py, with the recurrent cell fused
  into a Pallas TPU kernel on the scoring path.
- Reconstruction-error anomaly scoring, AUROC evaluation, heatmap and
  annotated-video rendering, and CLI entry points that mirror the
  reference's public flags (reference train.py / evaluate.py /
  train_video.py / evaluate_video.py).

Internals are TPU-first: NHWC layouts, `lax.scan` over time, jitted and
donated train steps, `jax.sharding.Mesh` data/model parallelism, and a
double-buffered host->device input pipeline.
"""

__version__ = "0.1.0"

from vad_tpu.core.runtime import setup_compilation_cache

setup_compilation_cache()

from vad_tpu.core.config import ImageAEConfig, VideoAEConfig  # noqa: F401
from vad_tpu.models.autoencoder import ConvAutoencoder, Encoder, Decoder  # noqa: F401
from vad_tpu.models.video_autoencoder import (  # noqa: F401
    ConvLSTM,
    ConvLSTMCell,
    VideoAutoencoder,
    VideoDecoder,
    VideoEncoder,
)
