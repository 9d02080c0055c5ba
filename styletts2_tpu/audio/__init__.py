from .stft import stft, istft, hann_window, frame_signal
from .mel import (
    melscale_fbanks,
    mel_spectrogram,
    LogMelConfig,
    log_mel_spectrogram,
    log_norm,
)

__all__ = [
    "stft",
    "istft",
    "hann_window",
    "frame_signal",
    "melscale_fbanks",
    "mel_spectrogram",
    "LogMelConfig",
    "log_mel_spectrogram",
    "log_norm",
]
