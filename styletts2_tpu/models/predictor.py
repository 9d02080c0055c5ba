"""Prosody predictor: durations + F0/energy (ref: models.py:550-740).

``DurationEncoder`` alternates BiLSTM layers (over features with the style
vector re-concatenated each round) with style-conditioned AdaLayerNorms.
``ProsodyPredictor`` adds a duration head (BiLSTM -> Linear(d_hid, max_dur))
and the F0/N head (shared BiLSTM -> two stacks of three AdainResBlk1d, the
middle one 2x-upsampling -> 1x1 conv projections).

All packed-sequence machinery is replaced by masked scans; every per-sample
reference loop is batched.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import init as jinit
from ..nn.conv import conv1d
from ..nn.linear import linear
from ..nn.lstm import bilstm
from ..nn.norm import ada_layer_norm
from . import common as cm
from .adain_blocks import adain_resblk1d_apply, init_adain_resblk1d


def init_duration_encoder(key, sty_dim: int, d_model: int, nlayers: int) -> Dict:
    lstms: Dict = {}
    for i in range(nlayers):
        k1, k2, key = jax.random.split(key, 3)
        lstms[str(2 * i)] = cm.init_lstm(k1, d_model + sty_dim, d_model // 2)
        lstms[str(2 * i + 1)] = {"fc": cm.init_linear(k2, sty_dim, d_model * 2)}
    return {"lstms": lstms}


def duration_encoder_apply(
    params: Dict,
    x: jnp.ndarray,          # (B, C, T) text features (bert-encoded)
    style: jnp.ndarray,      # (B, S)
    lengths: jnp.ndarray,    # (B,)
    nlayers: int = 3,
    dropout_p: float = 0.1,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Returns (B, T, d_model + sty) features with style channels appended."""
    b, _, t = x.shape
    keep = (jnp.arange(t)[None, :] < lengths[:, None])  # (B, T)
    s_t = jnp.broadcast_to(style[:, None, :], (b, t, style.shape[-1]))

    h = jnp.swapaxes(x, 1, 2)                            # (B, T, C)
    h = jnp.concatenate([h, s_t], axis=-1) * keep[..., None]

    lstms = params["lstms"]
    for i in range(nlayers):
        # BiLSTM layer (input d_model + sty -> d_model)
        h = bilstm(lstms[str(2 * i)], h, lengths)
        if train and rng is not None:
            h = cm.dropout(h, dropout_p, train, jax.random.fold_in(rng, i))
        # AdaLayerNorm + re-concat style
        h = ada_layer_norm(lstms[str(2 * i + 1)], h, style)
        h = jnp.concatenate([h, s_t], axis=-1) * keep[..., None]

    return h


def init_prosody_predictor(key, style_dim: int, d_hid: int, nlayers: int,
                           max_dur: int = 50) -> Dict:
    ks = jax.random.split(key, 12)
    p: Dict = {
        "text_encoder": init_duration_encoder(ks[0], style_dim, d_hid, nlayers),
        "lstm": cm.init_lstm(ks[1], d_hid + style_dim, d_hid // 2),
        # LinearNorm uses xavier_uniform (ref: models.py:230-240)
        "duration_proj": {"linear_layer": cm.init_linear(
            ks[2], d_hid, max_dur, w_init=jinit.xavier_uniform)},
        "shared": cm.init_lstm(ks[3], d_hid + style_dim, d_hid // 2),
        "F0": {
            "0": init_adain_resblk1d(ks[4], d_hid, d_hid, style_dim),
            "1": init_adain_resblk1d(ks[5], d_hid, d_hid // 2, style_dim, upsample=True),
            "2": init_adain_resblk1d(ks[6], d_hid // 2, d_hid // 2, style_dim),
        },
        "N": {
            "0": init_adain_resblk1d(ks[7], d_hid, d_hid, style_dim),
            "1": init_adain_resblk1d(ks[8], d_hid, d_hid // 2, style_dim, upsample=True),
            "2": init_adain_resblk1d(ks[9], d_hid // 2, d_hid // 2, style_dim),
        },
        "F0_proj": cm.init_conv(ks[10], d_hid // 2, 1, 1),
        "N_proj": cm.init_conv(ks[11], d_hid // 2, 1, 1),
    }
    return p


def prosody_duration_apply(
    params: Dict,
    texts: jnp.ndarray,        # (B, C, T) bert-encoded text features
    style: jnp.ndarray,        # (B, S)
    lengths: jnp.ndarray,      # (B,)
    alignment: jnp.ndarray,    # (B, T, T_mel)
    nlayers: int = 3,
    dropout_p: float = 0.1,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Duration logits (B, T, max_dur) and prosody encoding (B, C+S, T_mel)
    (ref: models.py:592-631)."""
    d = duration_encoder_apply(params["text_encoder"], texts, style, lengths,
                               nlayers, dropout_p, train, rng)
    x = bilstm(params["lstm"], d, lengths)              # (B, T, d_hid)
    x = cm.dropout(x, 0.5, train, jax.random.fold_in(rng, 101) if rng is not None else None)
    proj = params["duration_proj"]["linear_layer"]
    duration = linear(x, proj["weight"], proj["bias"])  # (B, T, max_dur)
    en = jnp.swapaxes(d, 1, 2) @ alignment              # (B, C+S, T_mel)
    return duration, en


def prosody_f0n_apply(
    params: Dict,
    x: jnp.ndarray,            # (B, C+S, T_mel) prosody encoding
    s: jnp.ndarray,            # (B, S)
    dropout_p: float = 0.1,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid frames (padded batches)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """F0 curve and energy (B, 2*T_mel) each (ref: models.py:638-651)."""
    h = bilstm(params["shared"], jnp.swapaxes(x, 1, 2), lengths)  # (B, T, d_hid)
    h = jnp.swapaxes(h, 1, 2)                            # (B, d_hid, T)

    def head(stack: Dict, proj: Dict, tag: int) -> jnp.ndarray:
        y = h
        cur = lengths
        for i, up in enumerate((False, True, False)):
            r = jax.random.fold_in(rng, tag * 10 + i) if rng is not None else None
            y = adain_resblk1d_apply(stack[str(i)], y, s, upsample=up,
                                     dropout_p=dropout_p, train=train, rng=r,
                                     lengths=cur)
            if up and cur is not None:
                cur = cur * 2
        y = conv1d(y, proj["weight"], proj["bias"])
        return y[:, 0, :]

    return head(params["F0"], params["F0_proj"], 1), head(params["N"], params["N_proj"], 2)
