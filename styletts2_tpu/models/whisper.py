"""Whisper encoder in JAX — the frozen SLM feature extractor
(ref: losses.py:195-353 uses HF ``WhisperModel.encoder`` of openai/whisper-base).

Implements the conv stem, learned positional embeddings (dynamically cropped
to the clip length, matching the reference's embedding-resize trick at
losses.py:283-293), pre-LN transformer layers, and collection of ALL hidden
states (embedding output + every layer) for the SLM feature-matching loss.

Also provides the slaney-scale Whisper log-mel frontend: the reference
computes ``log10(clamp(mel, 1e-10))`` with NO dynamic-range compression
(ref: losses.py:252-268) — preserved exactly.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.stft import stft, hann_window
from ..nn.conv import conv1d
from ..nn.linear import linear
from ..nn.norm import layer_norm


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 512
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    max_source_positions: int = 1500
    n_fft: int = 400
    hop_length: int = 160
    sample_rate: int = 16000


WHISPER_BASE = WhisperConfig()


# ---------------------------------------------------------------------------
# Slaney mel filterbank (whisper feature extractor)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    mels = 3.0 * f / 200.0
    log_region = f >= 1000.0
    logstep = np.log(6.4) / 27.0
    mels = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f = 200.0 * m / 3.0
    logstep = np.log(6.4) / 27.0
    f = np.where(m >= 15.0, 1000.0 * np.exp(logstep * (m - 15.0)), f)
    return f


@functools.lru_cache(maxsize=None)
def slaney_fbanks(n_freqs: int = 201, n_mels: int = 80, f_min: float = 0.0,
                  f_max: float = 8000.0, sample_rate: int = 16000) -> np.ndarray:
    """(n_freqs, n_mels) slaney-scale, slaney-normalized filterbank."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_slaney(f_min), _hz_to_mel_slaney(f_max), n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
    fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def whisper_log_mel(audio16k: jnp.ndarray, cfg: WhisperConfig = WHISPER_BASE) -> jnp.ndarray:
    """(B, T16k) -> (B, 80, frames): |stft|^2 mel, log10 with 1e-10 floor
    (ref: losses.py:252-268 — no max-normalization)."""
    spec = stft(audio16k, cfg.n_fft, cfg.hop_length, cfg.n_fft,
                hann_window(cfg.n_fft))
    mag2 = jnp.abs(spec) ** 2                                 # (B, F, T)
    fb = jnp.asarray(slaney_fbanks(cfg.n_fft // 2 + 1, cfg.n_mels))
    mel = jnp.swapaxes(jnp.swapaxes(mag2, 1, 2) @ fb, 1, 2)   # (B, 80, T)
    return jnp.log10(jnp.maximum(mel, 1e-10))


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def init_whisper_encoder(key, cfg: WhisperConfig = WHISPER_BASE) -> Dict:
    """Random-init params with HF layout (for tests; real use loads a ckpt)."""
    d = cfg.d_model

    def lin(k, i, o, bias=True):
        p = {"weight": 0.02 * jax.random.normal(k, (o, i))}
        if bias:
            p["bias"] = jnp.zeros((o,))
        return p

    def ln():
        return {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))}

    ks = jax.random.split(key, cfg.num_layers + 4)
    layers = {}
    for i in range(cfg.num_layers):
        lk = jax.random.split(ks[i], 8)
        layers[str(i)] = {
            "self_attn": {
                "q_proj": lin(lk[0], d, d),
                "k_proj": lin(lk[1], d, d, bias=False),
                "v_proj": lin(lk[2], d, d),
                "out_proj": lin(lk[3], d, d),
            },
            "self_attn_layer_norm": ln(),
            "fc1": lin(lk[4], d, cfg.ffn_dim),
            "fc2": lin(lk[5], cfg.ffn_dim, d),
            "final_layer_norm": ln(),
        }
    kc1, kc2, kp = jax.random.split(ks[-1], 3)
    return {
        "conv1": {"weight": 0.02 * jax.random.normal(kc1, (d, cfg.n_mels, 3)),
                  "bias": jnp.zeros((d,))},
        "conv2": {"weight": 0.02 * jax.random.normal(kc2, (d, d, 3)),
                  "bias": jnp.zeros((d,))},
        "embed_positions": {"weight": 0.02 * jax.random.normal(kp, (cfg.max_source_positions, d))},
        "layers": layers,
        "layer_norm": ln(),
    }


def whisper_encoder_apply(
    params: Dict,
    log_mel: jnp.ndarray,               # (B, n_mels, frames)
    cfg: WhisperConfig = WHISPER_BASE,
) -> List[jnp.ndarray]:
    """Returns all hidden states [embeddings, layer1, ..., layerN] each
    (B, frames//2, d_model), with the final one layer-normed (HF semantics:
    hidden_states[-1] == layer_norm output)."""
    from . import common as cm

    log_mel = cm.autocast(params, log_mel)  # fp32-pinned mel -> encoder dtype
    h = jax.nn.gelu(conv1d(log_mel, params["conv1"]["weight"], params["conv1"]["bias"],
                           padding=1), approximate=False)
    h = jax.nn.gelu(conv1d(h, params["conv2"]["weight"], params["conv2"]["bias"],
                           stride=2, padding=1), approximate=False)
    h = jnp.swapaxes(h, 1, 2)                                  # (B, T, D)
    t = h.shape[1]
    h = h + params["embed_positions"]["weight"][:t][None]

    # lax.scan over stacked layer params: identical math to the unrolled
    # loop, 6x less HLO fwd+bwd (this encoder compiles in three stage-2
    # subgraphs: feature loss, SLM-adversarial, discriminator)
    layer_list = [params["layers"][str(i)] for i in range(cfg.num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_list)

    def body(carry, lp):
        out = _whisper_layer(lp, carry, cfg)
        return out, out

    h_last, hs = jax.lax.scan(body, h, stacked)
    states = [h] + [hs[i] for i in range(cfg.num_layers)]
    # HF applies the final layer_norm and REPLACES the last hidden state
    final = layer_norm(h_last, params["layer_norm"]["weight"], params["layer_norm"]["bias"])
    states[-1] = final
    return states


def _whisper_layer(p: Dict, h: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    b, t, d = h.shape
    nh = cfg.num_heads
    hd = d // nh
    a = p["self_attn"]

    res = h
    x = layer_norm(h, p["self_attn_layer_norm"]["weight"], p["self_attn_layer_norm"]["bias"])
    q = linear(x, a["q_proj"]["weight"], a["q_proj"]["bias"]) * (hd ** -0.5)
    k = linear(x, a["k_proj"]["weight"], None)
    v = linear(x, a["v_proj"]["weight"], a["v_proj"]["bias"])

    def heads(z):
        return z.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)

    attn = jax.nn.softmax(jnp.einsum("bhld,bhmd->bhlm", heads(q), heads(k)), axis=-1)
    ctx = jnp.einsum("bhlm,bhmd->bhld", attn, heads(v))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, d)
    h = res + linear(ctx, a["out_proj"]["weight"], a["out_proj"]["bias"])

    res = h
    x = layer_norm(h, p["final_layer_norm"]["weight"], p["final_layer_norm"]["bias"])
    x = jax.nn.gelu(linear(x, p["fc1"]["weight"], p["fc1"]["bias"]), approximate=False)
    x = linear(x, p["fc2"]["weight"], p["fc2"]["bias"])
    return res + x
