"""Stage-1 training: mel reconstruction + TMA joint aligner training
(ref: train_first.py:104-576).

One jitted step performs the discriminator update followed by the generator
update (the reference's two backward passes), with the TMA phase a static
flag (pre/post-TMA compile two variants — phases change once per run).

TPU redesign of the reference hot loop:
- log-mels are computed on device from the batched waveforms
- the per-sample Python clip loop (ref: train_first.py:357-375) becomes a
  vmapped ``dynamic_slice`` with per-sample random starts
- ``maximum_path`` runs on device (no Cython host round-trip)
- the ``accelerator.gather`` of lengths for load balancing is host metadata
  (clip length is passed in as a static bucketed argument)
- the 50% soft/mono alignment choice is a traced bernoulli draw shared
  batch-wide, matching ``random.getrandbits(1)``
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..audio.mel import DATASET_MEL, log_mel_spectrogram, log_norm
from ..config import Config, LossParams, ModelParams
from ..losses.gan import discriminator_loss_full, generator_loss_full
from ..losses.slm import slm_feature_loss
from ..losses.stft_loss import multi_resolution_stft_loss
from ..models import common as cm
from ..models.asr import ASRConfig, asr_apply
from ..models.decoder import hifigan, istftnet
from ..models.discriminators import mpd_apply, msd_apply
from ..models.jdc import JDCConfig, jdc_apply
from ..models.style_encoder import style_encoder_apply
from ..models.text_encoder import text_encoder_apply
from ..models.whisper import WhisperConfig
from ..ops.monotonic import maximum_path_auto
from .optimizers import MultiOptimizer

HOP = 300
N_DOWN = 1  # aligner time downsampling (ref: Utils/ASR/models.py n_down=1)


class Stage1Outputs(NamedTuple):
    params: Dict
    opt_states: Dict
    metrics: Dict


def _clip_batch(x: jnp.ndarray, starts: jnp.ndarray, length: int, axis: int) -> jnp.ndarray:
    """Per-sample dynamic crops of fixed ``length`` along ``axis``."""
    def one(xi, st):
        return jax.lax.dynamic_slice_in_dim(xi, st, length, axis=axis - 1)
    return jax.vmap(one)(x, starts)


def compute_alignment(
    zoo: Dict,
    mels: jnp.ndarray,              # (B, 80, T)
    mel_lengths: jnp.ndarray,       # (B,)
    texts: jnp.ndarray,             # (B, T_text)
    text_lengths: jnp.ndarray,
    asr_cfg: ASRConfig,
    train: bool,
    rng,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Aligner forward + monotonic path (ref: train_first.py:317-345).

    Returns (ppgs, s2s_pred, s2s_attn, s2s_attn_mono) with s2s_attn shaped
    (B, T_text, T_mel//2).
    """
    b, _, t_mel = mels.shape
    t_text = texts.shape[1]
    mel_len_down = mel_lengths // (2 ** N_DOWN)
    mem_mask = jnp.arange(t_mel // 2)[None, :] + 1 > mel_len_down[:, None]
    ppgs, s2s_pred, s2s_attn_raw = (lambda o: (o["ctc_logits"], o["s2s_logits"], o["s2s_attn"]))(
        asr_apply(zoo["text_aligner"], mels, mem_mask, texts, asr_cfg, train, rng))

    # drop the SOS step: (B, T_text+1, L) -> (B, T_text, L)
    s2s_attn = s2s_attn_raw[:, 1:, :]
    text_keep = (jnp.arange(t_text)[None, :] + 1 <= text_lengths[:, None])
    mel_keep = (jnp.arange(t_mel // 2)[None, :] + 1 <= mel_len_down[:, None])
    attn_mask = text_keep[:, :, None] & mel_keep[:, None, :]
    s2s_attn = s2s_attn * attn_mask

    # The mono path is a DETACHED constant in the reference (the Cython DP
    # runs on CPU outside autograd, ref: utils.py:11-24): gradients flow
    # through s2s_attn in the L1 mono loss, never through the path search.
    # The stop_gradient also keeps the Pallas DP kernel (no JVP rule) usable
    # under value_and_grad on TPU.
    s2s_attn_mono = jax.lax.stop_gradient(
        maximum_path_auto(jax.lax.stop_gradient(s2s_attn),
                          text_lengths, mel_len_down))
    return ppgs, s2s_pred, s2s_attn, s2s_attn_mono


@dataclasses.dataclass
class Stage1Trainer:
    config: Config
    configs: Dict                   # zoo_configs() output
    optimizer: MultiOptimizer
    mixed_precision: str = "no"     # "no" | "bf16" (fp32 master weights)
    remat_discriminators: bool = True  # recompute MPD/MSD activations in the
                                       # backward pass (their conv towers are
                                       # the largest HBM temporaries)

    def make_step(self, tma: bool, mel_len: int, mel_len_st: int):
        """Build the jitted step for a (phase, clip-length) bucket.

        ``mel_len``: clip length in aligner frames (mel frames // 2),
        matching ``min(min_len/2 - 1, max_len//2)`` computed on host.
        """
        cfg = self.config
        mp: ModelParams = self.configs["model"]
        asr_cfg: ASRConfig = self.configs["asr"]
        jdc_cfg: JDCConfig = self.configs["jdc"]
        whisper_cfg: WhisperConfig = self.configs["whisper"]
        lp: LossParams = cfg.loss_params
        decoder_mod = istftnet if mp.decoder.type == "istftnet" else hifigan
        multispeaker = mp.multispeaker
        opt = self.optimizer

        use_bf16 = self.mixed_precision == "bf16"

        def _cast(tree):
            if not use_bf16:
                return tree
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

        def forward_to_waveform(gen_params, frozen, batch, key):
            # bf16 compute against fp32 master params: cast inside the loss so
            # gradients flow back to fp32 leaves (cast transpose = upcast)
            zoo = {**_cast(frozen), **_cast(gen_params)}
            mels = log_mel_spectrogram(batch["waves"], DATASET_MEL)
            t_cap = (mels.shape[-1] // 2) * 2
            mels = mels[..., :t_cap]
            mel_lengths = batch["mel_input_length"]
            texts, text_lengths = batch["texts"], batch["input_lengths"]

            ppgs, s2s_pred, s2s_attn, s2s_attn_mono = compute_alignment(
                zoo, mels, mel_lengths, texts, text_lengths, asr_cfg,
                train=True, rng=jax.random.fold_in(key, 1))

            t_en = text_encoder_apply(zoo["text_encoder"], texts, text_lengths,
                                      train=True, rng=jax.random.fold_in(key, 2))
            use_mono = jax.random.bernoulli(jax.random.fold_in(key, 3))
            attn = jnp.where(use_mono, s2s_attn_mono, s2s_attn)
            asr_feats = t_en @ attn                        # (B, C, T_mel//2)

            # random clips (static clip length, per-sample random start)
            half_len = mel_lengths // 2
            k_start = jax.random.fold_in(key, 4)
            u = jax.random.uniform(k_start, (texts.shape[0],))
            starts = (u * jnp.maximum(half_len - mel_len, 1).astype(jnp.float32)).astype(jnp.int32)
            en = _clip_batch(asr_feats, starts, mel_len, axis=2)
            gt = _clip_batch(mels, starts * 2, mel_len * 2, axis=2)
            wav = _clip_batch(batch["waves"], starts * 2 * HOP, mel_len * 2 * HOP, axis=1)

            u2 = jax.random.uniform(jax.random.fold_in(key, 5), (texts.shape[0],))
            st_starts = (u2 * jnp.maximum(half_len - mel_len_st, 1).astype(jnp.float32)).astype(jnp.int32)
            st = _clip_batch(mels, st_starts * 2, mel_len_st * 2, axis=2)

            gt = jax.lax.stop_gradient(gt)
            st = jax.lax.stop_gradient(st)
            wav = jax.lax.stop_gradient(wav)

            real_norm = jax.lax.stop_gradient(log_norm(gt))
            f0_real, _, _ = jdc_apply(zoo["pitch_extractor"], gt[:, None], jdc_cfg)

            style_in = st if multispeaker else gt
            s = style_encoder_apply(zoo["style_encoder"], style_in[:, None])

            y_rec = decoder_mod.decoder_apply(
                zoo["decoder"], mp.decoder, en, f0_real, real_norm, s,
                key=jax.random.fold_in(key, 6), train=True)
            aux = {
                "wav": wav, "s2s_pred": s2s_pred, "s2s_attn": s2s_attn,
                "s2s_attn_mono": s2s_attn_mono,
                "texts": texts, "text_lengths": text_lengths,
            }
            return y_rec, aux

        def disc_loss_fn(disc_params, frozen, y_rec, wav):
            zoo = {**_cast(frozen), **_cast(disc_params)}
            y = wav[:, None, :]
            mpd_out = mpd_apply(zoo["mpd"], y, y_rec)
            msd_out = msd_apply(zoo["msd"], y, y_rec)
            return discriminator_loss_full(mpd_out, msd_out)

        def gen_loss_fn(gen_params, frozen, batch, key):
            y_rec, aux = forward_to_waveform(gen_params, frozen, batch, key)
            zoo = {**_cast(frozen), **_cast(gen_params)}
            wav = aux["wav"]
            loss_mel = multi_resolution_stft_loss(
                y_rec[:, 0, :].astype(jnp.float32), wav.astype(jnp.float32))
            metrics = {"mel_loss": loss_mel}
            if not tma:
                return lp.lambda_mel * 0.0 + loss_mel, (metrics, y_rec, wav)

            # masked per-token CE over s2s logits (ref: train_first.py:407-411)
            logits = aux["s2s_pred"][:, :-1, :].astype(jnp.float32)  # CE in f32
            tmask = (jnp.arange(logits.shape[1])[None, :] <
                     aux["text_lengths"][:, None]).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, aux["texts"][..., None], axis=-1)[..., 0]
            # reference averages per-sample over its true length, then over batch
            loss_s2s = jnp.mean((nll * tmask).sum(1) / jnp.maximum(tmask.sum(1), 1))

            loss_mono = jnp.mean(jnp.abs(aux["s2s_attn"] - aux["s2s_attn_mono"])) * 10.0

            y = wav[:, None, :]
            disc_fwd = lambda yy, yr: generator_loss_full(
                mpd_apply(zoo["mpd"], yy, yr, batched=False),
                msd_apply(zoo["msd"], yy, yr, batched=False))
            if self.remat_discriminators:
                disc_fwd = jax.checkpoint(disc_fwd)
            loss_gen_all = disc_fwd(y, y_rec)

            loss_slm = slm_feature_loss(zoo["slm_encoder"], wav, y_rec[:, 0, :],
                                        whisper_cfg, mp.slm.hop_length)

            g_loss = (lp.lambda_mel * loss_mel + lp.lambda_mono * loss_mono
                      + lp.lambda_s2s * loss_s2s + lp.lambda_gen * loss_gen_all
                      + lp.lambda_slm * loss_slm)
            metrics.update(gen_loss=loss_gen_all, mono_loss=loss_mono,
                           s2s_loss=loss_s2s, slm_loss=loss_slm)
            return g_loss, (metrics, y_rec, wav)

        gen_keys = ("text_encoder", "style_encoder", "decoder") + (
            ("text_aligner", "pitch_extractor") if tma else ())
        disc_keys = ("mpd", "msd") if tma else ()

        def step(params: Dict, opt_states: Dict, batch: Dict, key) -> Stage1Outputs:
            gen_params = {k: params[k] for k in gen_keys}
            frozen = {k: v for k, v in params.items() if k not in gen_keys}

            d_loss = None
            if tma:
                # Discriminators step FIRST on the detached fake, then the
                # generator's adversarial loss sees the *updated* MPD/MSD —
                # the reference's update order (ref: train_first.py:391-430).
                # The plain forward here and the one inside the generator
                # grad pass below are identical expressions (same params,
                # batch, key), so XLA CSE merges them into one.
                y_rec0, aux0 = forward_to_waveform(gen_params, frozen, batch, key)
                disc_params = {k: params[k] for k in disc_keys}
                frozen_d = {k: v for k, v in params.items() if k not in disc_keys}
                d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
                    disc_params, frozen_d,
                    jax.lax.stop_gradient(y_rec0),
                    jax.lax.stop_gradient(aux0["wav"]))
                params, opt_states = opt.apply(params, d_grads, opt_states, disc_keys)
                frozen = {k: v for k, v in params.items() if k not in gen_keys}

            (g_loss, (metrics, y_rec, wav)), grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True)(gen_params, frozen, batch, key)
            metrics["g_loss"] = g_loss
            if d_loss is not None:
                metrics["d_loss"] = d_loss

            params2, opt_states = opt.apply(params, grads, opt_states, gen_keys)
            return Stage1Outputs(params2, opt_states, metrics)

        return jax.jit(step, donate_argnums=(0, 1))
