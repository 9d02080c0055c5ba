"""Phoneme text encoder (ref: models.py:363-437).

Embedding -> ``depth`` x [weight-norm Conv1d(k=5) + channel LayerNorm +
LeakyReLU(0.2) + Dropout(0.2)] -> BiLSTM, with padding masked to zero between
every stage.  The packed-sequence LSTM is replaced by the masked scan BiLSTM.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.lstm import bilstm
from ..nn.norm import layer_norm_channels
from . import common as cm


def init_text_encoder(key, n_symbols: int, channels: int = 512,
                      kernel_size: int = 5, depth: int = 3) -> Dict:
    keys = jax.random.split(key, depth + 2)
    params: Dict = {"embedding": cm.init_embedding(keys[0], n_symbols, channels)}
    cnn = {}
    for i in range(depth):
        cnn[str(i)] = {
            "0": cm.init_wn_conv(keys[i + 1], channels, channels, kernel_size),
            "1": {"gamma": jnp.ones((channels,)), "beta": jnp.zeros((channels,))},
        }
    params["cnn"] = cnn
    params["lstm"] = cm.init_lstm(keys[-1], channels, channels // 2, bidirectional=True)
    return params


def text_encoder_apply(
    params: Dict,
    tokens: jnp.ndarray,            # (B, T) int
    lengths: Optional[jnp.ndarray] = None,  # (B,) int
    *,
    kernel_size: int = 5,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Returns (B, C, T) masked features."""
    b, t = tokens.shape
    if lengths is None:
        lengths = jnp.full((b,), t, dtype=jnp.int32)
    keep = (jnp.arange(t)[None, :] < lengths[:, None])[:, None, :]  # (B,1,T)

    x = cm.embedding(params["embedding"], tokens)       # (B, T, C)
    x = jnp.swapaxes(x, 1, 2) * keep                    # (B, C, T)

    pad = (kernel_size - 1) // 2
    for i in range(len(params["cnn"])):
        block = params["cnn"][str(i)]
        x = cm.wn_conv1d(block["0"], x, padding=pad)
        x = layer_norm_channels(x, block["1"]["gamma"], block["1"]["beta"])
        x = cm.leaky_relu(x, 0.2)
        if train and rng is not None:
            x = cm.dropout(x, 0.2, train, jax.random.fold_in(rng, i))
        x = x * keep

    x = jnp.swapaxes(x, 1, 2)                           # (B, T, C)
    x = bilstm(params["lstm"], x, lengths)              # (B, T, C)
    x = jnp.swapaxes(x, 1, 2) * keep
    return x
