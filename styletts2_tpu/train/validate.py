"""Validation steps (ref: train_first.py:457-545, train_second.py:949-1068).

Stage 1: mel reconstruction loss with ground-truth F0/energy/alignment.
Stage 2: adds duration L1 and F0 losses through the predictor path.
Both are jitted, masked, and keyed by the same static clip buckets as the
train steps.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..audio.mel import DATASET_MEL, log_mel_spectrogram, log_norm
from ..config import Config
from ..losses.stft_loss import multi_resolution_stft_loss
from ..models.asr import ASRConfig
from ..models.decoder import hifigan, istftnet
from ..models.jdc import jdc_apply
from ..models.plbert import plbert_apply
from ..models.predictor import prosody_duration_apply, prosody_f0n_apply
from ..models.style_encoder import style_encoder_apply
from ..models.text_encoder import text_encoder_apply
from ..models import common as cm
from ..nn.linear import linear
from .stage1 import HOP, _clip_batch, compute_alignment


def make_stage1_val_step(config: Config, configs: Dict, mel_len: int):
    mp = configs["model"]
    asr_cfg: ASRConfig = configs["asr"]
    decoder_mod = istftnet if mp.decoder.type == "istftnet" else hifigan

    @jax.jit
    def val_step(zoo, batch, key):
        mels = log_mel_spectrogram(batch["waves"], DATASET_MEL)
        mels = mels[..., : (mels.shape[-1] // 2) * 2]
        mel_lengths = batch["mel_input_length"]
        texts, text_lengths = batch["texts"], batch["input_lengths"]

        _, _, _, mono = compute_alignment(zoo, mels, mel_lengths, texts,
                                          text_lengths, asr_cfg, False, None)
        t_en = text_encoder_apply(zoo["text_encoder"], texts, text_lengths)
        asr = t_en @ mono

        half = mel_lengths // 2
        u = jax.random.uniform(key, (texts.shape[0],))
        starts = (u * jnp.maximum(half - mel_len, 1).astype(jnp.float32)).astype(jnp.int32)
        en = _clip_batch(asr, starts, mel_len, axis=2)
        gt = _clip_batch(mels, starts * 2, mel_len * 2, axis=2)
        wav = _clip_batch(batch["waves"], starts * 2 * HOP, mel_len * 2 * HOP, axis=1)

        f0, _, _ = jdc_apply(zoo["pitch_extractor"], gt[:, None], configs["jdc"])
        rn = log_norm(gt)
        s = style_encoder_apply(zoo["style_encoder"], gt[:, None])
        y_rec = decoder_mod.decoder_apply(zoo["decoder"], mp.decoder, en, f0, rn, s)
        return {"mel_loss": multi_resolution_stft_loss(y_rec[:, 0, :], wav)}

    return val_step


def make_stage2_val_step(config: Config, configs: Dict, mel_len: int):
    mp = configs["model"]
    asr_cfg: ASRConfig = configs["asr"]
    plbert_cfg = configs["plbert"]
    decoder_mod = istftnet if mp.decoder.type == "istftnet" else hifigan

    @jax.jit
    def val_step(zoo, batch, key):
        mels = log_mel_spectrogram(batch["waves"], DATASET_MEL)
        mels = mels[..., : (mels.shape[-1] // 2) * 2]
        mel_lengths = batch["mel_input_length"]
        texts, text_lengths = batch["texts"], batch["input_lengths"]
        b, t_text = texts.shape

        _, _, _, mono = compute_alignment(zoo, mels, mel_lengths, texts,
                                          text_lengths, asr_cfg, False, None)
        t_en = text_encoder_apply(zoo["text_encoder"], texts, text_lengths)
        asr = t_en @ mono
        d_gt = jnp.sum(mono, axis=-1)

        s_dur = style_encoder_apply(zoo["predictor_encoder"], mels[:, None], mel_lengths)
        text_pad = cm.length_to_mask(text_lengths, t_text)
        bert_dur = plbert_apply(zoo["bert"], texts, (~text_pad).astype(jnp.int32),
                                plbert_cfg)
        d_en = jnp.swapaxes(linear(bert_dur, zoo["bert_encoder"]["weight"],
                                   zoo["bert_encoder"]["bias"]), 1, 2)
        dur_logits, p_full = prosody_duration_apply(
            zoo["predictor"], d_en, s_dur, text_lengths, mono, mp.n_layer)
        dur_pred = jax.nn.sigmoid(dur_logits).sum(-1)
        token_keep = (jnp.arange(t_text)[None, :] < text_lengths[:, None])
        inner = token_keep & (jnp.arange(t_text)[None, :] >= 1) & \
            (jnp.arange(t_text)[None, :] < (text_lengths - 1)[:, None])
        loss_dur = ((jnp.abs(dur_pred - d_gt) * inner).sum(1)
                    / jnp.maximum(inner.sum(1), 1)).mean()

        half = mel_lengths // 2
        u = jax.random.uniform(key, (b,))
        starts = (u * jnp.maximum(half - mel_len, 1).astype(jnp.float32)).astype(jnp.int32)
        en = _clip_batch(asr, starts, mel_len, axis=2)
        p_en = _clip_batch(p_full, starts, mel_len, axis=2)
        gt = _clip_batch(mels, starts * 2, mel_len * 2, axis=2)
        wav = _clip_batch(batch["waves"], starts * 2 * HOP, mel_len * 2 * HOP, axis=1)

        s_clip = style_encoder_apply(zoo["style_encoder"], gt[:, None])
        s_dur_clip = style_encoder_apply(zoo["predictor_encoder"], gt[:, None])
        f0_real, _, _ = jdc_apply(zoo["pitch_extractor"], gt[:, None], configs["jdc"])
        f0_fake, n_fake = prosody_f0n_apply(zoo["predictor"], p_en, s_dur_clip)
        d = f0_real - f0_fake
        loss_f0 = jnp.mean(jnp.where(jnp.abs(d) < 1, 0.5 * d * d, jnp.abs(d) - 0.5)) / 10

        y_rec = decoder_mod.decoder_apply(zoo["decoder"], mp.decoder, en,
                                          f0_fake, n_fake, s_clip)
        return {
            "mel_loss": multi_resolution_stft_loss(y_rec[:, 0, :], wav),
            "dur_loss": loss_dur,
            "F0_loss": loss_f0,
        }

    return val_step
