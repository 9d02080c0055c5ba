"""JDC pitch extractor (ref: Utils/JDC/model.py).

CRNN over mel spectrograms: conv stem -> three freq-pooling residual blocks
-> pool block -> BiLSTM sequence models -> per-frame F0 regression
(``classifier``, num_class=1 in the published checkpoint) and voicing
detection.  Training consumes ``abs(classifier_out)`` as the F0 curve
(ref: train_first.py:41-88).

BatchNorms run off stored running statistics (the reference loads a trained
checkpoint; in joint training torch DDP also uses per-replica batch stats —
we keep running-stat inference semantics which matches eval and frozen use).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.conv import conv2d
from ..nn.linear import linear
from ..nn.lstm import bilstm
from . import common as cm


@dataclasses.dataclass(frozen=True)
class JDCConfig:
    num_class: int = 1
    mel_bins: int = 80
    leaky_slope: float = 0.01
    lstm_hidden: int = 384
    lstm_layers: int = 2


def _bn_params(c: int) -> Dict:
    return {
        "weight": jnp.ones((c,)),
        "bias": jnp.zeros((c,)),
        "running_mean": jnp.zeros((c,)),
        "running_var": jnp.ones((c,)),
    }


def _bn(p: Dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    shape = (1, -1) + (1,) * (x.ndim - 2)
    mean = p["running_mean"].reshape(shape)
    var = p["running_var"].reshape(shape)
    return (x - mean) / jnp.sqrt(var + eps) * p["weight"].reshape(shape) + p["bias"].reshape(shape)


def _maxpool_freq(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """MaxPool2d(kernel=(1, k)) over the trailing (frequency) axis."""
    t = x.shape[-1] - x.shape[-1] % k
    xr = x[..., :t].reshape(*x.shape[:-1], t // k, k)
    return xr.max(axis=-1)


def _init_seq_lstm(key, input_size: int, hidden: int, layers: int) -> Dict:
    p = {}
    for l in range(layers):
        in_sz = input_size if l == 0 else hidden * 2
        p.update(cm.init_lstm(jax.random.fold_in(key, l), in_sz, hidden,
                              bidirectional=True, layer=f"l{l}"))
    return p


def init_jdc(key, cfg: JDCConfig = JDCConfig()) -> Dict:
    ks = jax.random.split(key, 16)

    def conv(k, i, o, kernel):
        return {"weight": cm.jinit_hifigan(k, (o, i) + ((kernel, kernel) if isinstance(kernel, int) else kernel))}

    def resblock(k, i, o):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "pre_conv": {"0": _bn_params(i)},
            "conv": {"0": conv(k1, i, o, 3), "1": _bn_params(o), "3": conv(k2, o, o, 3)},
            "conv1by1": conv(k3, i, o, 1),
        }

    return {
        "conv_block": {"0": conv(ks[0], 1, 64, 3), "1": _bn_params(64),
                       "3": conv(ks[1], 64, 64, 3)},
        "res_block1": resblock(ks[2], 64, 128),
        "res_block2": resblock(ks[3], 128, 192),
        "res_block3": resblock(ks[4], 192, 256),
        "pool_block": {"0": _bn_params(256)},
        "detector_conv": {"0": conv(ks[5], 640, 256, 1), "1": _bn_params(256)},
        "sequence_classifier": {"model": _init_seq_lstm(ks[6], 512, cfg.lstm_hidden, cfg.lstm_layers)},
        "sequence_detector": {"model": _init_seq_lstm(ks[7], 512, cfg.lstm_hidden, cfg.lstm_layers)},
        "classifier": cm.init_linear(ks[8], cfg.lstm_hidden * 2, cfg.num_class),
        "detector": cm.init_linear(ks[9], cfg.lstm_hidden * 2, 2),
    }


def _res_block(p: Dict, x: jnp.ndarray, slope: float, downsample: bool = True) -> jnp.ndarray:
    h = _bn(p["pre_conv"]["0"], x)
    h = cm.leaky_relu(h, slope)
    h = _maxpool_freq(h, 2)
    y = conv2d(h, p["conv"]["0"]["weight"], padding=1)
    y = _bn(p["conv"]["1"], y)
    y = cm.leaky_relu(y, slope)
    y = conv2d(y, p["conv"]["3"]["weight"], padding=1)
    sc = conv2d(h, p["conv1by1"]["weight"]) if downsample else h
    return y + sc


def _seq_lstm(p: Dict, x: jnp.ndarray, layers: int) -> jnp.ndarray:
    for l in range(layers):
        x = bilstm(p, x, layer=f"l{l}")
    return x


def jdc_apply(
    params: Dict,
    mels: jnp.ndarray,              # (B, 80, T) or (B, 1, 80, T) normalized log-mel
    cfg: JDCConfig = JDCConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (f0 (B, T), voicing (B, T), features).

    The F0 output is ``abs(classifier_out)`` with singleton class squeezed,
    matching the training adapter (ref: train_first.py:41-88).
    """
    x = mels if mels.ndim == 4 else mels[:, None]
    x = cm.autocast(params, x)
    # layout normalization: mel bins go last (ref: Utils/JDC/model.py:88-109)
    if x.shape[-1] != cfg.mel_bins and x.shape[-2] == cfg.mel_bins:
        x = jnp.swapaxes(x, -1, -2)               # (B, 1, T, mel)

    slope = cfg.leaky_slope
    cb = params["conv_block"]
    h = conv2d(x, cb["0"]["weight"], padding=1)
    h = _bn(cb["1"], h)
    h = cm.leaky_relu(h, slope)
    conv_out = conv2d(h, cb["3"]["weight"], padding=1)       # (B, 64, T, 80)

    r1 = _res_block(params["res_block1"], conv_out, slope)   # (B, 128, T, 40)
    r2 = _res_block(params["res_block2"], r1, slope)         # (B, 192, T, 20)
    r3 = _res_block(params["res_block3"], r2, slope)         # (B, 256, T, 10)

    pb = _bn(params["pool_block"]["0"], r3)
    pb = cm.leaky_relu(pb, slope)
    pool = _maxpool_freq(pb, 4)                              # (B, 256, T, 2)

    b, c, t, f = pool.shape
    cls_in = pool.transpose(0, 2, 1, 3).reshape(b, t, c * f)  # (B, T, 512)
    cls = _seq_lstm(params["sequence_classifier"]["model"], cls_in, cfg.lstm_layers)
    cls = linear(cls, params["classifier"]["weight"], params["classifier"]["bias"])

    mp1 = _maxpool_freq(conv_out, 40)
    mp2 = _maxpool_freq(r1, 20)
    mp3 = _maxpool_freq(r2, 10)
    det = jnp.concatenate([mp1, mp2, mp3, pool], axis=1)     # (B, 640, T, 2)
    dc = params["detector_conv"]
    det = conv2d(det, dc["0"]["weight"])
    det = _bn(dc["1"], det)
    det = cm.leaky_relu(det, slope)
    det_in = det.transpose(0, 2, 1, 3).reshape(b, t, 512)
    det_h = _seq_lstm(params["sequence_detector"]["model"], det_in, cfg.lstm_layers)
    det_out = linear(det_h, params["detector"]["weight"], params["detector"]["bias"])
    voicing = det_out.sum(axis=-1)                           # (B, T)

    f0 = jnp.abs(cls[..., 0] if cfg.num_class == 1 else cls.squeeze(-1))
    return f0, voicing, pool
