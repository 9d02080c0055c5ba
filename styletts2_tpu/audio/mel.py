"""Mel-spectrogram frontend.

TPU-native equivalent of the reference's torchaudio-based mel pipeline.

Two distinct mel configurations exist in the reference and both are preserved:

1. The *dataset* frontend (ref: meldataset.py:35-43) builds
   ``torchaudio.transforms.MelSpectrogram(n_mels=80, n_fft=2048,
   win_length=1200, hop_length=300)`` — note it leaves ``sample_rate`` at the
   torchaudio default of 16000 even though audio is 24 kHz, so the filterbank
   spans 0..8 kHz.  This quirk is load-bearing (all published checkpoints were
   trained with it) and is the default here.

2. The *loss* frontends (ref: losses.py:26-57) pass ``sample_rate=24000``
   explicitly with multiple (n_fft, hop, win) resolutions.

Both normalize as ``(log(1e-5 + mel) - (-4)) / 4``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .stft import stft, hann_window


def _hz_to_mel_htk(freq):
    return 2595.0 * np.log10(1.0 + freq / 700.0)


def _mel_to_hz_htk(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def _fbanks_np(n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int):
    # Triangular filters on the HTK mel scale with no normalization — the
    # torchaudio ``melscale_fbanks(norm=None, mel_scale="htk")`` behaviour.
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]            # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> jnp.ndarray:
    """(n_freqs, n_mels) HTK-scale triangular filterbank."""
    return jnp.asarray(_fbanks_np(n_freqs, float(f_min), float(f_max), n_mels, sample_rate))


@dataclasses.dataclass(frozen=True)
class LogMelConfig:
    """Static mel frontend configuration."""

    n_fft: int = 2048
    win_length: int = 1200
    hop_length: int = 300
    n_mels: int = 80
    # Filterbank scale rate.  16000 reproduces the reference dataset quirk
    # (ref: meldataset.py:35 relies on the torchaudio default).
    fbank_sample_rate: int = 16000
    f_min: float = 0.0
    f_max: Optional[float] = None
    mean: float = -4.0
    std: float = 4.0
    power: float = 2.0

    @property
    def effective_f_max(self) -> float:
        return self.f_max if self.f_max is not None else float(self.fbank_sample_rate) / 2.0


DATASET_MEL = LogMelConfig()
LOSS_MEL_24K = LogMelConfig(fbank_sample_rate=24000)


def mel_spectrogram(wave: jnp.ndarray, cfg: LogMelConfig = DATASET_MEL) -> jnp.ndarray:
    """Power mel spectrogram of ``wave`` (..., T) -> (..., n_mels, n_frames)."""
    spec = stft(wave, cfg.n_fft, cfg.hop_length, cfg.win_length,
                hann_window(cfg.win_length, jnp.float32))
    power = jnp.abs(spec) ** cfg.power                      # (..., n_freq, frames)
    fb = melscale_fbanks(cfg.n_fft // 2 + 1, cfg.f_min, cfg.effective_f_max,
                         cfg.n_mels, cfg.fbank_sample_rate)
    return jnp.swapaxes(jnp.swapaxes(power, -1, -2) @ fb, -1, -2)


def log_mel_spectrogram(wave: jnp.ndarray, cfg: LogMelConfig = DATASET_MEL) -> jnp.ndarray:
    """Normalized log-mel: ``(log(1e-5 + mel) - mean) / std`` (ref: meldataset.py:39-43)."""
    mel = mel_spectrogram(wave, cfg)
    return (jnp.log(1e-5 + mel) - cfg.mean) / cfg.std


def log_norm(x: jnp.ndarray, mean: float = -4.0, std: float = 4.0, axis: int = -2) -> jnp.ndarray:
    """log L2-norm of the de-normalized mel — the energy target (ref: utils.py:45-50).

    ``x`` is a normalized log-mel (..., n_mels, frames); reduction is over the
    mel axis, returning (..., frames).
    """
    return jnp.log(jnp.linalg.norm(jnp.exp(x * std + mean), axis=axis))
