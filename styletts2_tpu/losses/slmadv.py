"""SLM adversarial training (ref: Modules/slmadv.py).

Full text->speech pipeline on OOD (or in-distribution) text: sample a style
via the diffusion sampler, predict durations, build the differentiable
Gaussian alignment, synthesize, and score with the Whisper discriminator.

SPMD redesign: the reference's data-dependent skips (``SkipSLMAdversarial``
when fewer than 2 valid samples, cross-rank min-batch gathers,
``batch_percentage`` truncation) become *masked uniform computation* — every
replica executes the same program and invalid samples contribute zero weight.
The discriminator-vs-generator alternation (every ``skip_update`` iters) is a
static flag chosen by the host loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelParams, SlmAdvParams
from ..models import common as cm
from ..models.decoder import hifigan, istftnet
from ..models.diffusion import sampler as S
from ..models.diffusion.denoiser import denoiser_apply, fixed_embedding
from ..models.plbert import PLBertConfig, plbert_apply
from ..models.predictor import prosody_duration_apply, prosody_f0n_apply
from ..models.text_encoder import text_encoder_apply
from ..models.whisper import WhisperConfig
from ..nn.linear import linear
from ..ops.alignment import gaussian_alignment
from .slm import slm_discriminator_loss, slm_discriminator_forward, slm_generator_loss

HOP = 300


class SlmAdvOut(NamedTuple):
    d_loss: jnp.ndarray
    gen_loss: jnp.ndarray
    valid_fraction: jnp.ndarray


def slm_adversarial(
    zoo: Dict,
    key,
    mp: ModelParams,
    plbert_cfg: PLBertConfig,
    whisper_cfg: WhisperConfig,
    adv: SlmAdvParams,
    ref_texts: jnp.ndarray,          # (B, L) OOD or in-dist token ids
    ref_lengths: jnp.ndarray,        # (B,)
    waves: jnp.ndarray,              # (B, T) ground-truth waveforms
    mel_input_length: jnp.ndarray,   # (B,)
    y_rec_gt: jnp.ndarray,           # (B, T_clip) recording clip
    y_rec_gt_pred: jnp.ndarray,      # (B, T_clip) reconstruction clip
    s_trg: jnp.ndarray,              # (B, 2*style) ground-truth styles
    ref_style: Optional[jnp.ndarray],  # (B, 2*style) multispeaker ref or None
    num_steps: int,                  # static: randint(3, 5) chosen by host
    use_ind_style: bool,             # static: use s_trg instead of sampling
    run_discriminator: bool,         # static: every `iter` steps
    frame_capacity: int,             # static Gaussian-alignment frame budget
    mel_len: Optional[int] = None,   # static clip length in en-frames
    use_rec: bool = False,           # static: host randint — real branch uses the
                                     # reconstruction instead of GT clips
                                     # (ref: slmadv.py:214-219)
    real_alt: bool = False,          # static: host randint — cropped vs full real
                                     # in the LSGAN term (ref: slmadv.py:227, 236)
    sigma_data=0.2,                  # live estimate: the reference's sampler
                                     # shares model.diffusion.diffusion, whose
                                     # sigma_data train_second.py:598-600 just
                                     # updated with the batch estimate
) -> SlmAdvOut:
    b, length = ref_texts.shape
    style_dim = mp.style_dim
    # clip length: the reference's min_len (mel frames) bounded by what the
    # batch actually provides (ref: slmadv.py:154-155 min/max clamp)
    if mel_len is None:
        mel_len = adv.min_len // 2
    mel_len = min(mel_len, adv.max_len // 2)
    text_mask_pad = cm.length_to_mask(ref_lengths, length)

    bert_dur = plbert_apply(zoo["bert"], ref_texts, (~text_mask_pad).astype(jnp.int32),
                            plbert_cfg)
    d_en = jnp.swapaxes(
        linear(bert_dur, zoo["bert_encoder"]["weight"], zoo["bert_encoder"]["bias"]), 1, 2)

    if use_ind_style:
        s_preds = s_trg
    else:
        def net(x, c_noise):
            # embedding_mask_proba=0.1 during slmadv sampling (ref: slmadv.py:86)
            mask = jax.random.bernoulli(jax.random.fold_in(key, 40), 0.1, (b, 1, 1))
            fix = fixed_embedding(zoo["diffusion"]["transformer"], b, length)
            emb = jnp.where(mask, fix, jax.lax.stop_gradient(bert_dur))
            return denoiser_apply(
                zoo["diffusion"]["transformer"], x, c_noise, emb,
                features=ref_style if mp.multispeaker else None,
                num_heads=mp.diffusion.transformer.num_heads,
                style_conditioned=mp.multispeaker)

        fn = S.k_denoise_fn(net, sigma_data)
        noise = jax.random.normal(jax.random.fold_in(key, 41), (b, 1, style_dim * 2))
        sigmas = S.karras_schedule(num_steps)
        # clamp=False: ref samples styles unclamped (train_second.py:418-422)
        s_preds = S.adpm2_sample(jax.random.fold_in(key, 42), noise, fn, sigmas,
                                 num_steps, clamp=False)[:, 0, :]

    s_dur = s_preds[:, style_dim:]
    acoustic = s_preds[:, :style_dim]

    dur_logits, _ = prosody_duration_apply(
        zoo["predictor"], d_en, s_dur, ref_lengths,
        jnp.zeros((b, length, 1)),  # alignment unused for the duration output
        mp.n_layer, train=True, rng=jax.random.fold_in(key, 43))

    attn, pred_frames = gaussian_alignment(dur_logits, ref_lengths, frame_capacity,
                                           adv.sig)

    t_en = jax.lax.stop_gradient(
        text_encoder_apply(zoo["text_encoder"], ref_texts, ref_lengths))
    asr_pred = t_en @ attn                                   # (B, C, frame_capacity)

    _, p_pred = prosody_duration_apply(
        zoo["predictor"], d_en, s_dur, ref_lengths, attn, mp.n_layer,
        train=True, rng=jax.random.fold_in(key, 44))

    # random clips of the predicted feature streams (masked validity)
    mel_length_gt = mel_input_length // 2
    valid = (mel_length_gt > mel_len) & (pred_frames > mel_len)
    u = jax.random.uniform(jax.random.fold_in(key, 45), (b,))
    start_pred = (u * jnp.maximum(pred_frames - mel_len, 1)).astype(jnp.int32)

    def clip(x, st):
        return jax.vmap(lambda xi, s0: jax.lax.dynamic_slice_in_dim(xi, s0, mel_len, axis=1))(x, st)

    en = clip(asr_pred, start_pred)
    p_en = clip(p_pred, start_pred)

    decoder_mod = istftnet if mp.decoder.type == "istftnet" else hifigan
    f0_fake, n_fake = prosody_f0n_apply(zoo["predictor"], p_en, s_dur)
    y_pred = decoder_mod.decoder_apply(zoo["decoder"], mp.decoder, en,
                                       f0_fake, n_fake, acoustic)[:, 0, :]

    # ground-truth waveform clips
    u2 = jax.random.uniform(jax.random.fold_in(key, 46), (b,))
    start_gt = (u2 * jnp.maximum(mel_length_gt - mel_len, 1)).astype(jnp.int32)
    wav = jax.vmap(
        lambda w, s0: jax.lax.dynamic_slice_in_dim(w, s0 * 2 * HOP, mel_len * 2 * HOP)
    )(waves, start_gt)
    wav = jax.lax.stop_gradient(wav)

    # per-sample validity weighting + the reference's >=2-valid rule
    # (ref: slmadv.py:183-190 raises SkipSLMAdversarial below 2)
    vf = valid.astype(jnp.float32)
    enough = (vf.sum() >= 2.0).astype(jnp.float32)
    weights = vf * enough

    gen_loss = slm_generator_loss(zoo["slm_encoder"], zoo["wd"], y_pred,
                                  whisper_cfg, mp.slm.hop_length,
                                  sample_weights=weights)

    if run_discriminator:
        d_loss = _slm_discriminator_step(
            zoo, whisper_cfg, mp, wav, y_pred, y_rec_gt, y_rec_gt_pred,
            weights, enough, use_rec, real_alt)
    else:
        d_loss = jnp.zeros(())

    return SlmAdvOut(d_loss, gen_loss, vf.mean())


def _per_sample_l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """L1 over all non-batch axes -> (B,)."""
    diff = jnp.abs(a - b)
    return diff.reshape(diff.shape[0], -1).mean(axis=-1)


def _weighted_mean(per_sample: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    w = weights.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def _slm_discriminator_step(zoo, whisper_cfg, mp, wav, y_pred, y_rec_gt,
                            y_rec_gt_pred, weights, enough, use_rec, real_alt):
    """The reference's every-``skip_update``-iters discriminator branch with
    both regularizers (ref: slmadv.py:212-249), masked-uniform.

    ``use_rec``/``real_alt`` are the host-level ``np.random.randint(0, 2)``
    draws; here they are static flags so both code paths keep static shapes.
    When ``use_rec``: the real branch is the stage-2 reconstruction clip, the
    shorter of (real, fake) defines the crop, and the *length-invariance*
    regularizer L1(disc(cropped), disc(full)[:len]) teaches the discriminator
    to ignore clip-length differences; the *reconstruction-invariance*
    regularizer L1(disc(gt), disc(rec)) teaches it to ignore vocoder
    artifacts."""
    hop = mp.slm.hop_length
    fwd = lambda x: slm_discriminator_forward(zoo["slm_encoder"], zoo["wd"], x,
                                              whisper_cfg, hop)
    d_fake = jax.lax.stop_gradient(y_pred)
    if not use_rec:
        return slm_discriminator_loss(
            zoo["slm_encoder"], zoo["wd"], jax.lax.stop_gradient(wav), d_fake,
            whisper_cfg, hop, sample_weights=weights)

    rec = jax.lax.stop_gradient(y_rec_gt_pred)
    t_rec, t_p = rec.shape[-1], y_pred.shape[-1]
    crop = min(t_rec, t_p)
    if t_rec > t_p:
        # real is longer: crop the real branch (ref: slmadv.py:222-231)
        real_gp = rec[:, :crop]
        out_crop, out_org = fwd(real_gp), fwd(rec)
        loss_reg = _weighted_mean(
            _per_sample_l1(out_crop, out_org[..., : out_crop.shape[-1]]),
            jnp.full(rec.shape[:1], enough))
        d_real = real_gp if real_alt else rec
        d_loss = slm_discriminator_loss(
            zoo["slm_encoder"], zoo["wd"], d_real, d_fake,
            whisper_cfg, hop, sample_weights=weights)
    else:
        # fake is longer: crop the fake branch (ref: slmadv.py:232-241)
        fake_gp = d_fake[:, :crop]
        out_crop, out_org = fwd(fake_gp), fwd(d_fake)
        loss_reg = _weighted_mean(
            _per_sample_l1(out_crop, out_org[..., : out_crop.shape[-1]]),
            weights)
        d_loss = slm_discriminator_loss(
            zoo["slm_encoder"], zoo["wd"], rec,
            fake_gp if real_alt else d_fake,
            whisper_cfg, hop, sample_weights=weights)
    d_loss = d_loss + loss_reg

    # reconstruction-invariance regularizer (ref: slmadv.py:243-249)
    out_gt = fwd(y_rec_gt)
    out_rec = fwd(y_rec_gt_pred)
    return d_loss + jnp.mean(jnp.abs(out_gt - out_rec)) * enough
