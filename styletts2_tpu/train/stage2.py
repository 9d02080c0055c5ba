"""Stage-2 training: prosody/duration + style diffusion + joint SLM
adversarial (ref: train_second.py:174-1245).

Phase gating (diffusion from ``diff_epoch``, joint+SLM from ``joint_epoch``,
discriminators from ``start_ds``) is static per compiled step variant.  All
of the reference's DDP desync machinery — try/except aligner skips,
``gt_valid`` gathers, ``SkipSLMAdversarial`` consensus — disappears: SPMD
replicas run one uniform program and invalid work is masked, so desync is
impossible by construction.

The reference's per-sample full-utterance style loop
(ref: train_second.py:574-587, "cannot be done in batch because of the
avgpool") is replaced by the masked-pool batched style encoders.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..audio.mel import DATASET_MEL, log_mel_spectrogram, log_norm
from ..config import Config, LossParams, ModelParams, SlmAdvParams
from ..losses.gan import discriminator_loss_full, generator_loss_full
from ..losses.slm import slm_feature_loss
from ..losses.slmadv import slm_adversarial
from ..losses.stft_loss import multi_resolution_stft_loss
from ..models import common as cm
from ..models.asr import ASRConfig
from ..models.decoder import hifigan, istftnet
from ..models.discriminators import mpd_apply, msd_apply
from ..models.diffusion import sampler as S
from ..models.diffusion.denoiser import denoiser_apply, fixed_embedding
from ..models.jdc import JDCConfig, jdc_apply
from ..models.plbert import PLBertConfig, plbert_apply
from ..models.predictor import prosody_duration_apply, prosody_f0n_apply
from ..models.style_encoder import style_encoder_apply
from ..models.text_encoder import text_encoder_apply
from ..models.whisper import WhisperConfig
from ..nn.linear import linear
from .optimizers import MultiOptimizer, clip_by_global_norm_if_above, scale_module_grads
from .stage1 import HOP, _clip_batch, compute_alignment


class Stage2Outputs(NamedTuple):
    params: Dict
    opt_states: Dict
    metrics: Dict
    sigma_data: jnp.ndarray


def _smooth_l1(x, y):
    d = x - y
    ad = jnp.abs(d)
    return jnp.mean(jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5))


@dataclasses.dataclass
class Stage2Trainer:
    config: Config
    configs: Dict
    optimizer: MultiOptimizer
    mixed_precision: str = "no"     # "no" | "bf16" (fp32 master weights)
    remat_discriminators: bool = True  # recompute MPD/MSD activations in the
                                       # backward pass (their conv towers are
                                       # the largest HBM temporaries)

    def make_step(
        self,
        diff: bool,
        joint: bool,
        start_ds: bool,
        mel_len: int,
        mel_len_st: int,
        num_diff_steps: int = 4,
        slm_run_disc: bool = False,
        slm_use_ind: bool = False,
        slm_frame_capacity: int = 400,
        finetune: bool = False,
        slm_use_rec: bool = False,
        slm_real_alt: bool = False,
    ):
        """``finetune=True`` reproduces train_finetune.py: every module
        (including text_encoder/text_aligner) trains from step 0, the TMA
        mono/s2s losses are added, and the soft/monotonic alignment choice is
        a 50% draw (ref: train_finetune.py:380-565)."""
        cfg = self.config
        mp: ModelParams = self.configs["model"]
        asr_cfg: ASRConfig = self.configs["asr"]
        jdc_cfg: JDCConfig = self.configs["jdc"]
        whisper_cfg: WhisperConfig = self.configs["whisper"]
        plbert_cfg: PLBertConfig = self.configs["plbert"]
        lp: LossParams = cfg.loss_params
        adv: SlmAdvParams = cfg.slmadv_params
        decoder_mod = istftnet if mp.decoder.type == "istftnet" else hifigan
        multispeaker = mp.multispeaker
        opt = self.optimizer

        gen_keys = ("bert_encoder", "bert", "predictor", "predictor_encoder") + (
            ("diffusion",) if diff else ()) + (
            ("style_encoder", "decoder") if (joint or finetune) else ()) + (
            ("text_encoder", "text_aligner") if finetune else ())
        disc_keys = ("mpd", "msd") if start_ds else ()

        use_bf16 = self.mixed_precision == "bf16"

        def _cast(tree):
            if not use_bf16:
                return tree
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)

        def gen_loss_fn(gen_params, frozen, batch, key, sigma_data_in):
            zoo = {**_cast(frozen), **_cast(gen_params)}
            mels = log_mel_spectrogram(batch["waves"], DATASET_MEL)
            mels = mels[..., : (mels.shape[-1] // 2) * 2]
            mel_lengths = batch["mel_input_length"]
            texts, text_lengths = batch["texts"], batch["input_lengths"]
            b = texts.shape[0]

            # ---- alignment (no-grad in stage 2, trained in finetune) ---
            if finetune:
                _, s2s_pred, s2s_attn, s2s_attn_mono = compute_alignment(
                    zoo, mels, mel_lengths, texts, text_lengths, asr_cfg,
                    train=True, rng=jax.random.fold_in(key, 19))
                t_en = text_encoder_apply(zoo["text_encoder"], texts, text_lengths,
                                          train=True, rng=jax.random.fold_in(key, 18))
                use_mono = jax.random.bernoulli(jax.random.fold_in(key, 17))
                asr_full = t_en @ jnp.where(use_mono, s2s_attn_mono, s2s_attn)
            else:
                _, s2s_pred, s2s_attn, s2s_attn_mono = jax.lax.stop_gradient(
                    compute_alignment(zoo, mels, mel_lengths, texts, text_lengths,
                                      asr_cfg, train=False, rng=None))
                t_en = text_encoder_apply(zoo["text_encoder"], texts, text_lengths)
                asr_full = jax.lax.stop_gradient(t_en @ s2s_attn_mono)
            d_gt = jax.lax.stop_gradient(jnp.sum(s2s_attn_mono, axis=-1))

            # ---- full-utterance styles (batched masked pooling) -------
            s_dur_full = style_encoder_apply(zoo["predictor_encoder"], mels[:, None],
                                             mel_lengths)
            gs_full = style_encoder_apply(zoo["style_encoder"], mels[:, None],
                                          mel_lengths)
            s_trg = jax.lax.stop_gradient(
                jnp.concatenate([gs_full, s_dur_full], axis=-1))

            text_pad = cm.length_to_mask(text_lengths, texts.shape[1])
            bert_dur = plbert_apply(zoo["bert"], texts, (~text_pad).astype(jnp.int32),
                                    plbert_cfg)
            d_en = jnp.swapaxes(
                linear(bert_dur, zoo["bert_encoder"]["weight"],
                       zoo["bert_encoder"]["bias"]), 1, 2)

            metrics = {}
            # ---- multispeaker reference styles ------------------------
            ref_style = None
            if multispeaker and diff:
                ref_mels = log_mel_spectrogram(batch["ref_waves"], DATASET_MEL)
                ref_len = batch["ref_frame_lengths"]
                ref_ss = style_encoder_apply(zoo["style_encoder"], ref_mels[:, None], ref_len)
                ref_sp = style_encoder_apply(zoo["predictor_encoder"], ref_mels[:, None], ref_len)
                ref_style = jnp.concatenate([ref_ss, ref_sp], axis=-1)

            # ---- diffusion training -----------------------------------
            if diff:
                if mp.diffusion.dist.estimate_sigma_data:
                    # f32: this scalar round-trips through TrainState across
                    # steps, so its dtype must not follow the compute dtype
                    sigma_data = jnp.mean(jnp.std(s_trg.astype(jnp.float32), axis=-1))
                else:
                    sigma_data = sigma_data_in

                def net_train(x, c_noise):
                    mask = jax.random.bernoulli(
                        jax.random.fold_in(key, 20),
                        mp.diffusion.embedding_mask_proba, (b, 1, 1))
                    fix = fixed_embedding(zoo["diffusion"]["transformer"], b,
                                          bert_dur.shape[1])
                    emb = jnp.where(mask, fix, bert_dur)
                    return denoiser_apply(
                        zoo["diffusion"]["transformer"], x, c_noise, emb,
                        features=ref_style, num_heads=mp.diffusion.transformer.num_heads,
                        style_conditioned=multispeaker)

                loss_diff = S.k_diffusion_loss(
                    jax.random.fold_in(key, 21), net_train, s_trg[:, None, :],
                    sigma_data, mp.diffusion.dist.mean, mp.diffusion.dist.std)

                # sampled styles for the style reconstruction loss (no grad)
                def net_eval(x, c_noise):
                    return denoiser_apply(
                        zoo["diffusion"]["transformer"], x, c_noise,
                        jax.lax.stop_gradient(bert_dur),
                        features=None if ref_style is None else jax.lax.stop_gradient(ref_style),
                        num_heads=mp.diffusion.transformer.num_heads,
                        style_conditioned=multispeaker)

                fn = S.k_denoise_fn(net_eval, sigma_data)
                noise = jax.random.normal(jax.random.fold_in(key, 22),
                                          (b, 1, mp.style_dim * 2))
                sigmas = S.karras_schedule(num_diff_steps)
                # clamp=False: ref builds its sampler unclamped
                # (train_second.py:418-422)
                s_preds = S.adpm2_sample(jax.random.fold_in(key, 23), noise, fn,
                                         sigmas, num_diff_steps, clamp=False)[:, 0, :]
                loss_sty = jnp.mean(jnp.abs(s_preds - s_trg))
            else:
                sigma_data = sigma_data_in
                loss_diff = jnp.zeros(())
                loss_sty = jnp.zeros(())

            # ---- duration / prosody -----------------------------------
            dur_logits, p_full = prosody_duration_apply(
                zoo["predictor"], d_en, s_dur_full, text_lengths, s2s_attn_mono,
                mp.n_layer, train=True, rng=jax.random.fold_in(key, 24))

            # ---- clips -------------------------------------------------
            half_len = mel_lengths // 2
            u = jax.random.uniform(jax.random.fold_in(key, 25), (b,))
            starts = (u * jnp.maximum(half_len - mel_len, 1).astype(jnp.float32)).astype(jnp.int32)
            en = _clip_batch(asr_full, starts, mel_len, axis=2)
            p_en = _clip_batch(p_full, starts, mel_len, axis=2)
            gt = jax.lax.stop_gradient(_clip_batch(mels, starts * 2, mel_len * 2, axis=2))
            wav_clip = jax.lax.stop_gradient(
                _clip_batch(batch["waves"], starts * 2 * HOP, mel_len * 2 * HOP, axis=1))

            u2 = jax.random.uniform(jax.random.fold_in(key, 26), (b,))
            st_starts = (u2 * jnp.maximum(half_len - mel_len_st, 1).astype(jnp.float32)).astype(jnp.int32)
            st = jax.lax.stop_gradient(
                _clip_batch(mels, st_starts * 2, mel_len_st * 2, axis=2))

            style_src = st if multispeaker else gt
            s_dur_clip = style_encoder_apply(zoo["predictor_encoder"], style_src[:, None])
            s_clip = style_encoder_apply(zoo["style_encoder"], style_src[:, None])

            f0_real, _, _ = jdc_apply(zoo["pitch_extractor"], gt[:, None], jdc_cfg)
            f0_real = jax.lax.stop_gradient(f0_real)
            n_real = jax.lax.stop_gradient(log_norm(gt))

            y_rec_gt_pred = jax.lax.stop_gradient(
                decoder_mod.decoder_apply(zoo["decoder"], mp.decoder, en, f0_real,
                                          n_real, s_clip))[:, 0, :]
            wav_target = wav_clip if joint else y_rec_gt_pred

            f0_fake, n_fake = prosody_f0n_apply(
                zoo["predictor"], p_en, s_dur_clip,
                train=True, rng=jax.random.fold_in(key, 27))

            y_rec = decoder_mod.decoder_apply(
                zoo["decoder"], mp.decoder, en, f0_fake, n_fake, s_clip,
                key=jax.random.fold_in(key, 28), train=True)

            loss_f0 = _smooth_l1(f0_real, f0_fake) / 10.0
            loss_norm = _smooth_l1(n_real, n_fake)
            loss_mel = multi_resolution_stft_loss(
                y_rec[:, 0, :].astype(jnp.float32), wav_target.astype(jnp.float32))

            if start_ds:
                y = wav_target[:, None, :]
                disc_fwd = lambda yy, yr: generator_loss_full(
                    mpd_apply(zoo["mpd"], yy, yr, batched=False),
                    msd_apply(zoo["msd"], yy, yr, batched=False))
                if self.remat_discriminators:
                    disc_fwd = jax.checkpoint(disc_fwd)
                loss_gen_all = disc_fwd(y, y_rec)
            else:
                loss_gen_all = jnp.zeros(())

            loss_lm = slm_feature_loss(zoo["slm_encoder"], wav_target, y_rec[:, 0, :],
                                       whisper_cfg, mp.slm.hop_length)

            # duration CE + L1 (ref: train_second.py:741-755), batched+masked
            t_text = texts.shape[1]
            dur_logits = dur_logits.astype(jnp.float32)  # BCE/log1p in f32
            max_dur = dur_logits.shape[-1]
            token_keep = (jnp.arange(t_text)[None, :] < text_lengths[:, None])
            trg = (jnp.arange(max_dur)[None, None, :] <
                   d_gt[..., None]).astype(jnp.float32)
            bce = jnp.maximum(dur_logits, 0) - dur_logits * trg + \
                jnp.log1p(jnp.exp(-jnp.abs(dur_logits)))
            per_sample_ce = (bce * token_keep[..., None]).sum((1, 2)) / \
                jnp.maximum(token_keep.sum(1) * max_dur, 1)
            loss_ce = per_sample_ce.mean()

            dur_pred = jax.nn.sigmoid(dur_logits).sum(-1)
            inner = token_keep & (jnp.arange(t_text)[None, :] >= 1) & \
                (jnp.arange(t_text)[None, :] < (text_lengths - 1)[:, None])
            per_sample_dur = (jnp.abs(dur_pred - d_gt) * inner).sum(1) / \
                jnp.maximum(inner.sum(1), 1)
            loss_dur = per_sample_dur.mean()

            g_loss = (lp.lambda_mel * loss_mel + lp.lambda_F0 * loss_f0
                      + lp.lambda_ce * loss_ce + lp.lambda_norm * loss_norm
                      + lp.lambda_dur * loss_dur + lp.lambda_gen * loss_gen_all
                      + lp.lambda_slm * loss_lm + lp.lambda_sty * loss_sty
                      + lp.lambda_diff * loss_diff)

            if finetune:
                # TMA losses (ref: train_finetune.py:547-565)
                logits = s2s_pred[:, :-1, :].astype(jnp.float32)  # CE in f32
                tk = token_keep.astype(jnp.float32)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, texts[..., None], axis=-1)[..., 0]
                loss_s2s = jnp.mean((nll * tk).sum(1) / jnp.maximum(tk.sum(1), 1))
                loss_mono = jnp.mean(jnp.abs(s2s_attn - s2s_attn_mono)) * 10.0
                g_loss = g_loss + lp.lambda_mono * loss_mono + lp.lambda_s2s * loss_s2s
                metrics_extra = {"mono_loss": loss_mono, "s2s_loss": loss_s2s}
            else:
                metrics_extra = {}

            metrics.update(mel_loss=loss_mel, d_loss=jnp.zeros(()), dur_loss=loss_dur,
                           ce_loss=loss_ce, norm_loss=loss_norm, F0_loss=loss_f0,
                           lm_loss=loss_lm, gen_loss=loss_gen_all, sty_loss=loss_sty,
                           diff_loss=loss_diff, **metrics_extra)
            aux = {
                "y_rec": y_rec, "wav_target": wav_target, "sigma_data": sigma_data,
                "y_rec_gt": wav_clip, "y_rec_gt_pred": y_rec_gt_pred,
                "s_trg": s_trg, "ref_style": ref_style, "metrics": metrics,
            }
            return g_loss, aux

        def disc_loss_fn(disc_params, frozen, y_rec, wav):
            zoo = {**_cast(frozen), **_cast(disc_params)}
            y = wav[:, None, :]
            mpd_out = mpd_apply(zoo["mpd"], y, jax.lax.stop_gradient(y_rec))
            msd_out = msd_apply(zoo["msd"], y, jax.lax.stop_gradient(y_rec))
            return discriminator_loss_full(mpd_out, msd_out)

        def slm_loss_fn(slm_params, frozen, batch, key, aux):
            zoo = {**_cast(frozen), **_cast(slm_params)}
            out = slm_adversarial(
                zoo, jax.random.fold_in(key, 50), mp, plbert_cfg, whisper_cfg, adv,
                batch["texts"] if slm_use_ind else batch["ref_texts"],
                batch["input_lengths"] if slm_use_ind else batch["ref_lengths"],
                batch["waves"], batch["mel_input_length"],
                aux["y_rec_gt"], aux["y_rec_gt_pred"],
                jax.lax.stop_gradient(aux["s_trg"]),
                aux["ref_style"] if multispeaker else None,
                num_steps=num_diff_steps, use_ind_style=slm_use_ind,
                run_discriminator=slm_run_disc,
                frame_capacity=slm_frame_capacity,
                mel_len=min(adv.min_len // 2, mel_len),
                use_rec=slm_use_rec, real_alt=slm_real_alt,
                sigma_data=aux["sigma_data"])
            return (out.d_loss if slm_run_disc else out.gen_loss), out

        def step(params, opt_states, batch, key, sigma_data) -> Stage2Outputs:
            gen_params = {k: params[k] for k in gen_keys}
            frozen = {k: v for k, v in params.items() if k not in gen_keys}

            d_loss = None
            if start_ds:
                # Discriminators step FIRST on the detached fake, so the
                # generator's adversarial loss below sees the updated MPD/MSD
                # (ref: train_second.py:719-779 update order).  This plain
                # forward and the generator grad pass are identical
                # expressions, so XLA CSE merges them.
                _, aux0 = gen_loss_fn(gen_params, frozen, batch, key, sigma_data)
                disc_params = {k: params[k] for k in disc_keys}
                frozen_d = {k: v for k, v in params.items() if k not in disc_keys}
                d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
                    disc_params, frozen_d,
                    jax.lax.stop_gradient(aux0["y_rec"]),
                    jax.lax.stop_gradient(aux0["wav_target"]))
                params, opt_states = opt.apply(params, d_grads, opt_states, disc_keys)
                frozen = {k: v for k, v in params.items() if k not in gen_keys}

            (g_loss, aux), grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
                gen_params, frozen, batch, key, sigma_data)
            metrics = dict(aux["metrics"])
            metrics["g_loss"] = g_loss
            if d_loss is not None:
                metrics["d_loss"] = d_loss
            params, opt_states = opt.apply(params, grads, opt_states, gen_keys)

            if joint:
                if slm_run_disc:
                    slm_keys = ("wd",)
                else:
                    slm_keys = ("bert_encoder", "bert", "predictor", "diffusion")
                slm_params = {k: params[k] for k in slm_keys}
                frozen_s = {k: v for k, v in params.items() if k not in slm_keys}
                (slm_loss, slm_out), s_grads = jax.value_and_grad(
                    slm_loss_fn, has_aux=True)(slm_params, frozen_s, batch, key, aux)
                if not slm_run_disc:
                    # grad-norm rescale + 0.01x on duration/lstm/diffusion
                    # (ref: train_second.py:856-882)
                    s_grads, norm = clip_by_global_norm_if_above(s_grads, adv.thresh)
                    s_grads = scale_module_grads(s_grads, {"diffusion": adv.scale})
                    if "predictor" in s_grads:
                        pg = dict(s_grads["predictor"])
                        for sub in ("duration_proj", "lstm"):
                            if sub in pg:
                                pg[sub] = jax.tree_util.tree_map(
                                    lambda g: g * adv.scale, pg[sub])
                        s_grads = {**s_grads, "predictor": pg}
                params, opt_states = opt.apply(params, s_grads, opt_states, slm_keys)
                metrics["d_loss_slm" if slm_run_disc else "gen_loss_slm"] = slm_loss
                metrics["slm_valid_fraction"] = slm_out.valid_fraction

            return Stage2Outputs(params, opt_states, metrics, aux["sigma_data"])

        return jax.jit(step, donate_argnums=(0, 1))
