from .frontend import Frontend, periodic_hann
from .io import get_audio_duration, get_sampling_rate, load_audio, read_wav, resample
from .mel import mel_filter_bank

__all__ = [
    "Frontend",
    "periodic_hann",
    "get_audio_duration",
    "get_sampling_rate",
    "load_audio",
    "read_wav",
    "resample",
    "mel_filter_bank",
]
