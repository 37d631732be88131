from vad_tpu.models.autoencoder import ConvAutoencoder, Decoder, Encoder  # noqa: F401
from vad_tpu.models.video_autoencoder import (  # noqa: F401
    ConvLSTM,
    ConvLSTMCell,
    VideoAutoencoder,
    VideoDecoder,
    VideoEncoder,
)
