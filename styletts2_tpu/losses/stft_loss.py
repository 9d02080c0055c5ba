"""Multi-resolution mel-STFT reconstruction loss (ref: losses.py:9-96).

Each resolution computes 24 kHz mel spectrograms of predicted and target
waveforms, log-normalizes with the (log(1e-5+x)+4)/4 convention, and takes
the L1 spectral-convergence ratio ||y - x||_1 / ||y||_1; resolutions are
averaged.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from ..audio.mel import LogMelConfig, log_mel_spectrogram

RESOLUTIONS: Tuple[Tuple[int, int, int], ...] = (
    (1024, 120, 600),
    (2048, 240, 1200),
    (512, 50, 240),
)


def stft_loss(x: jnp.ndarray, y: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    cfg = LogMelConfig(n_fft=n_fft, hop_length=hop, win_length=win,
                       fbank_sample_rate=24000)
    x_mag = log_mel_spectrogram(x, cfg)
    y_mag = log_mel_spectrogram(y, cfg)
    return jnp.sum(jnp.abs(y_mag - x_mag)) / jnp.sum(jnp.abs(y_mag))


def multi_resolution_stft_loss(
    x: jnp.ndarray, y: jnp.ndarray,
    resolutions: Sequence[Tuple[int, int, int]] = RESOLUTIONS,
) -> jnp.ndarray:
    """x, y: (B, T) waveforms."""
    total = 0.0
    for n_fft, hop, win in resolutions:
        total = total + stft_loss(x, y, n_fft, hop, win)
    return total / len(resolutions)
