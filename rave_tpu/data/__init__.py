from rave_tpu.data.dataset import (
    AudioDataset,
    HTTPAudioDataset,
    LazyAudioDataset,
    get_dataset,
    split_dataset,
)
from rave_tpu.data.loader import Loader

__all__ = [
    "AudioDataset",
    "LazyAudioDataset",
    "HTTPAudioDataset",
    "get_dataset",
    "split_dataset",
    "Loader",
]
