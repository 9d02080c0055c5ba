"""Polyphase sinc resampling (torchaudio ``Resample`` semantics).

Used by the SLM (Whisper) loss to convert 24 kHz model output to 16 kHz
(ref: losses.py:239-247).  Implements the standard windowed-sinc polyphase
algorithm with a Hann window (``sinc_interp_hann``, lowpass_filter_width 6,
rolloff 0.99) as a strided convolution — one MXU-friendly conv instead of a
host-side DSP call.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _sinc_kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                 rolloff: float = 0.99):
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd

    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = (-np.arange(new, dtype=np.float64) / new)[:, None] + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t *= np.pi
    scale = base_freq / orig
    kernels = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels *= window * scale
    return kernels.astype(np.float32), width, orig, new


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jnp.ndarray:
    """Resample (..., T) from ``orig_freq`` to ``new_freq``."""
    if orig_freq == new_freq:
        return x
    kernels, width, orig, new = _sinc_kernel(orig_freq, new_freq,
                                             lowpass_filter_width, rolloff)
    length = x.shape[-1]
    lead = x.shape[:-1]
    xx = x.reshape(-1, 1, length)
    xx = jnp.pad(xx, ((0, 0), (0, 0), (width, width + orig)))
    y = lax.conv_general_dilated(
        xx, jnp.asarray(kernels)[:, None, :],
        window_strides=(orig,), padding=((0, 0),),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (N, new, T//orig ceil-ish)
    y = jnp.swapaxes(y, 1, 2).reshape(*lead, -1)
    target_len = int(math.ceil(new_freq * length / orig_freq))
    return y[..., :target_len]
