from transformer4sed_tpu.frontend.mel import (
    PasstFrontend,
    MelFrontend,
    kaldi_mel_banks,
    htk_mel_banks,
    stft_magnitude,
    fast_normalize,
    amplitude_to_db,
)
from transformer4sed_tpu.frontend import augment

__all__ = [
    "PasstFrontend",
    "MelFrontend",
    "kaldi_mel_banks",
    "htk_mel_banks",
    "stft_magnitude",
    "fast_normalize",
    "amplitude_to_db",
    "augment",
]
