"""SLM (Whisper) losses (ref: losses.py:195-353).

The frozen Whisper encoder consumes 16 kHz resampled audio through the
reference's custom log-mel (no dynamic-range compression); every hidden
state is linearly interpolated to the StyleTTS2 frame length; the stacked
(B, hidden*layers, T) features feed the Whisper discriminator head.

All functions are pure; freezing is expressed with ``stop_gradient`` at the
same points the reference uses ``torch.no_grad``.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..audio.resample import resample
from ..models.whisper import WhisperConfig, whisper_encoder_apply, whisper_log_mel
from ..models.discriminators import whisper_discriminator_apply
from ..nn.conv import interpolate_linear


def slm_encode(
    whisper_params: Dict,
    audio: jnp.ndarray,               # (B, T) 24 kHz waveform
    target_length: int,
    cfg: WhisperConfig = WhisperConfig(),
    model_sr: int = 24000,
) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Returns (hidden_states interpolated to target_length, stacked features).

    hidden states: list of (B, target_length, d_model);
    stacked: (B, layers*d_model, target_length) (ref: losses.py:270-307).
    """
    audio16 = resample(audio, model_sr, cfg.sample_rate)
    log_mel = whisper_log_mel(audio16, cfg)
    seq = log_mel.shape[-1]
    padded = int(math.ceil(seq / 2) * 2)
    max_allowed = cfg.max_source_positions * 2
    padded = min(padded, max_allowed)
    if seq > padded:
        log_mel = log_mel[..., :padded]
    elif seq < padded:
        log_mel = jnp.pad(log_mel, ((0, 0), (0, 0), (0, padded - seq)))

    states = whisper_encoder_apply(whisper_params, log_mel, cfg)
    processed = []
    for hs in states:
        hs_cf = jnp.swapaxes(hs, 1, 2)                          # (B, D, T')
        hs_cf = interpolate_linear(hs_cf, out_len=target_length)
        processed.append(jnp.swapaxes(hs_cf, 1, 2))
    stacked = jnp.concatenate([jnp.swapaxes(h, 1, 2) for h in processed], axis=1)
    return processed, stacked


def target_frames(num_samples: int, hop_length: int = 300) -> int:
    return max(1, int(math.ceil(num_samples / hop_length)))


def slm_feature_loss(
    whisper_params: Dict,
    wav: jnp.ndarray,
    y_rec: jnp.ndarray,
    cfg: WhisperConfig = WhisperConfig(),
    hop_length: int = 300,
) -> jnp.ndarray:
    """Feature-matching L1 across all hidden states (ref: losses.py:309-319)."""
    t = max(target_frames(wav.shape[-1], hop_length),
            target_frames(y_rec.shape[-1], hop_length))
    wav_states, _ = slm_encode(whisper_params, jax.lax.stop_gradient(wav), t, cfg)
    y_states, _ = slm_encode(whisper_params, y_rec, t, cfg)
    loss = 0.0
    for real, gen in zip(wav_states, y_states):
        # accumulate in f32: a bf16 mean over B*T*D elements drops bits
        loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(real) - gen),
                               dtype=jnp.float32)
    return loss / len(wav_states)


def _weighted_mean(per_sample: jnp.ndarray, weights) -> jnp.ndarray:
    """Mean over samples, optionally weighted (masked SPMD validity)."""
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def slm_generator_loss(whisper_params: Dict, wd_params: Dict, y_rec: jnp.ndarray,
                       cfg: WhisperConfig = WhisperConfig(), hop_length: int = 300,
                       sample_weights=None) -> jnp.ndarray:
    t = target_frames(y_rec.shape[-1], hop_length)
    _, emb = slm_encode(whisper_params, y_rec, t, cfg)
    score = whisper_discriminator_apply(wd_params, emb)
    return _weighted_mean(jnp.mean((1.0 - score) ** 2, axis=-1), sample_weights)


def slm_discriminator_loss(whisper_params: Dict, wd_params: Dict,
                           wav: jnp.ndarray, y_rec: jnp.ndarray,
                           cfg: WhisperConfig = WhisperConfig(),
                           hop_length: int = 300,
                           sample_weights=None) -> jnp.ndarray:
    t = max(target_frames(wav.shape[-1], hop_length),
            target_frames(y_rec.shape[-1], hop_length))
    _, emb_r = slm_encode(whisper_params, jax.lax.stop_gradient(wav), t, cfg)
    _, emb_g = slm_encode(whisper_params, jax.lax.stop_gradient(y_rec), t, cfg)
    emb_r = jax.lax.stop_gradient(emb_r)
    emb_g = jax.lax.stop_gradient(emb_g)
    score_r = whisper_discriminator_apply(wd_params, emb_r)
    score_g = whisper_discriminator_apply(wd_params, emb_g)
    return (_weighted_mean(jnp.mean((1.0 - score_r) ** 2, axis=-1), sample_weights)
            + _weighted_mean(jnp.mean(score_g ** 2, axis=-1), sample_weights))


def slm_discriminator_forward(whisper_params: Dict, wd_params: Dict, wav: jnp.ndarray,
                              cfg: WhisperConfig = WhisperConfig(),
                              hop_length: int = 300) -> jnp.ndarray:
    t = target_frames(wav.shape[-1], hop_length)
    _, emb = slm_encode(whisper_params, jax.lax.stop_gradient(wav), t, cfg)
    return whisper_discriminator_apply(wd_params, jax.lax.stop_gradient(emb))
