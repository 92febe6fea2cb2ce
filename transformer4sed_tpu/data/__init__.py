from transformer4sed_tpu.data.audio_io import load_audio, load_wav_batch, pad_wav, to_mono, waveform_modification
from transformer4sed_tpu.data.datasets import (
    StronglyLabeledDataset,
    WeaklyLabeledDataset,
    UnlabeledDataset,
    FrameWiseLabeledDataset,
)
from transformer4sed_tpu.data.sampler import (
    ConcatBatchSampler,
    RandomSampler,
    SequentialSampler,
    WeightedSampler,
)
from transformer4sed_tpu.data.loader import DataLoader, collate
from transformer4sed_tpu.data.scaler import Scaler

__all__ = [
    "load_audio",
    "pad_wav",
    "to_mono",
    "waveform_modification",
    "load_wav_batch",
    "StronglyLabeledDataset",
    "WeaklyLabeledDataset",
    "UnlabeledDataset",
    "FrameWiseLabeledDataset",
    "ConcatBatchSampler",
    "RandomSampler",
    "SequentialSampler",
    "WeightedSampler",
    "DataLoader",
    "collate",
    "Scaler",
]
