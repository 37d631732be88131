from vad_tpu.data.image_dataset import MVTecDataset, get_dataloaders  # noqa: F401
from vad_tpu.data.loader import DistributedLoader, Loader  # noqa: F401
from vad_tpu.data.video_dataset import (  # noqa: F401
    IPADDataset,
    VideoDataset,
    VideoFileDataset,
    get_video_dataloaders,
)
