"""GAN discriminators (ref: Modules/discriminators.py).

- MultiPeriodDiscriminator: five period reshapers (2/3/5/7/11) with strided
  Conv2d towers over (T/p, p)-folded waveforms.
- MultiResSpecDiscriminator: three STFT-magnitude Conv2d towers.
- WhisperDiscriminator: Conv1d tower over stacked Whisper hidden states
  (slm_hidden * slm_layers channels), the SLM adversarial head.

All convs are weight-normed; feature maps are returned for the
feature-matching loss.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..audio.stft import hann_window, stft
from . import common as cm

LRELU_SLOPE = 0.1

PERIODS = (2, 3, 5, 7, 11)
SPEC_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


# ---------------------------------------------------------------------------
# Multi-period discriminator
# ---------------------------------------------------------------------------

def init_mpd(key) -> Dict:
    p: Dict = {"discriminators": {}}
    for i, _ in enumerate(PERIODS):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
        convs = {str(j): cm.init_wn_conv(ks[j], ci, co, (5, 1))
                 for j, (ci, co) in enumerate(chans)}
        p["discriminators"][str(i)] = {
            "convs": convs,
            "conv_post": cm.init_wn_conv(ks[5], 1024, 1, (3, 1)),
        }
    return p


def _discriminator_p(p: Dict, x: jnp.ndarray, period: int) -> Tuple[jnp.ndarray, List]:
    b, c, t = x.shape
    if t % period != 0:
        pad = period - (t % period)
        x = jnp.concatenate([x, x[..., -pad - 1:-1][..., ::-1]], axis=-1)  # reflect
        t = t + pad
    x = x.reshape(b, c, t // period, period)

    fmap = []
    for j in range(5):
        stride = (3, 1) if j < 4 else (1, 1)
        pad = (2, 0)
        x = cm.wn_conv2d(p["convs"][str(j)], x, stride=stride, padding=pad)
        x = cm.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = cm.wn_conv2d(p["conv_post"], x, padding=(1, 0))
    fmap.append(x)
    return x.reshape(b, -1), fmap


def mpd_apply(params: Dict, y: jnp.ndarray, y_hat: jnp.ndarray):
    """Returns (real_scores, fake_scores, real_fmaps, fake_fmaps)."""
    y, y_hat = cm.autocast(params, y, y_hat)
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for i, period in enumerate(PERIODS):
        p = params["discriminators"][str(i)]
        r, fr = _discriminator_p(p, y, period)
        g, fg = _discriminator_p(p, y_hat, period)
        y_d_rs.append(r); fmap_rs.append(fr)
        y_d_gs.append(g); fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Multi-resolution spectrogram discriminator
# ---------------------------------------------------------------------------

def init_msd(key) -> Dict:
    p: Dict = {"discriminators": {}}
    for i, _ in enumerate(SPEC_RESOLUTIONS):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        p["discriminators"][str(i)] = {
            "discriminators": {
                "0": cm.init_wn_conv(ks[0], 1, 32, (3, 9)),
                "1": cm.init_wn_conv(ks[1], 32, 32, (3, 9)),
                "2": cm.init_wn_conv(ks[2], 32, 32, (3, 9)),
                "3": cm.init_wn_conv(ks[3], 32, 32, (3, 9)),
                "4": cm.init_wn_conv(ks[4], 32, 32, (3, 3)),
            },
            "out": cm.init_wn_conv(ks[5], 32, 1, (3, 3)),
        }
    return p


DROP_NYQUIST = True  # 2^k+1 bin counts pad 8x on TPU lanes (T(2,128) layout);
                     # dropping the Nyquist bin restores dense tiling. Affects
                     # only discriminator scores (training dynamics), not audio.


def _spec_discriminator(p: Dict, x: jnp.ndarray, res) -> Tuple[jnp.ndarray, List]:
    n_fft, hop, win = res
    mag = jnp.abs(stft(x[:, 0, :], n_fft, hop, win, hann_window(win)))
    if DROP_NYQUIST:
        mag = mag[:, :-1, :]
    # the STFT is fp32-pinned; the conv tower runs in the params' dtype
    y = cm.autocast(p, jnp.swapaxes(mag, 1, 2)[:, None])     # (B, 1, frames, bins)
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [(1, 4), (1, 4), (1, 4), (1, 4), (1, 1)]
    for j in range(5):
        y = cm.wn_conv2d(p["discriminators"][str(j)], y, stride=strides[j], padding=pads[j])
        y = cm.leaky_relu(y, LRELU_SLOPE)
        fmap.append(y)
    y = cm.wn_conv2d(p["out"], y, padding=(1, 1))
    fmap.append(y)
    return y.reshape(y.shape[0], -1), fmap


def msd_apply(params: Dict, y: jnp.ndarray, y_hat: jnp.ndarray):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for i, res in enumerate(SPEC_RESOLUTIONS):
        p = params["discriminators"][str(i)]
        r, fr = _spec_discriminator(p, y, res)
        g, fg = _spec_discriminator(p, y_hat, res)
        y_d_rs.append(r); fmap_rs.append(fr)
        y_d_gs.append(g); fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Whisper (SLM) discriminator head
# ---------------------------------------------------------------------------

def init_whisper_discriminator(key, slm_hidden: int = 512, slm_layers: int = 7,
                               initial_channel: int = 64) -> Dict:
    ks = jax.random.split(key, 5)
    c = initial_channel
    return {
        "pre": cm.init_wn_conv(ks[0], slm_hidden * slm_layers, c, 1),
        "convs": {
            "0": cm.init_wn_conv(ks[1], c, c * 2, 5),
            "1": cm.init_wn_conv(ks[2], c * 2, c * 4, 5),
            "2": cm.init_wn_conv(ks[3], c * 4, c * 4, 5),
        },
        "conv_post": cm.init_wn_conv(ks[4], c * 4, 1, 3),
    }


def whisper_discriminator_apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, slm_hidden*slm_layers, T) stacked SLM features -> (B, T) scores."""
    x = cm.wn_conv1d(params["pre"], x)
    for j in range(3):
        x = cm.wn_conv1d(params["convs"][str(j)], x, padding=2)
        x = cm.leaky_relu(x, LRELU_SLOPE)
    x = cm.wn_conv1d(params["conv_post"], x, padding=1)
    return x.reshape(x.shape[0], -1)
