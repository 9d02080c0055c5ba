"""Inference engine — the demo-notebook API, TPU-native.

Reference behaviour (Demo/Inference_LJSpeech.ipynb cell 17,
Demo/Inference_LibriTTS.ipynb cells 5/16/28/42/45) reorganized into two
jit-compiled stages with static shape buckets:

1. ``frontend``: tokens -> text/bert encodings, ADPM2 style sampling,
   duration prediction.  Bucketed by token length.
2. ``synthesize``: hard alignment expansion -> F0/N -> decoder -> waveform.
   Bucketed by (token length, frame capacity).

The reference's host-side ``pred_aln_trg`` loop becomes a broadcasted-iota
alignment; CFG runs as one doubled batch; everything between token ids and
the waveform stays on device.  Batched inputs are first-class — the engine
synthesizes whole padded batches in one call (the reference is batch-1 only).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelParams
from .models import common as cm
from .models.decoder import hifigan, istftnet
from .models.diffusion import sampler as S
from .models.diffusion.denoiser import denoiser_cfg_apply
from .models.plbert import PLBertConfig, plbert_apply
from .models.predictor import duration_encoder_apply, prosody_f0n_apply
from .models.text_encoder import text_encoder_apply
from .nn.linear import linear
from .nn.lstm import bilstm
from .ops.alignment import hard_alignment
from .text import TextCleaner


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclasses.dataclass
class InferenceEngine:
    """Caches jitted stages per shape bucket."""

    zoo: Dict
    model_params: ModelParams
    plbert_cfg: PLBertConfig = PLBertConfig()
    sigma_data: float = 0.2
    token_bucket: int = 32
    frame_bucket: int = 100
    last_token_pad: int = 5        # LJSpeech demo: pred_dur[-1] += 5
    input_sharding: object = None  # optional NamedSharding for batch inputs
    compute_dtype: object = None   # e.g. jnp.bfloat16 for MXU-rate serving
    duration_headroom: int = 10    # speculative frames per token (en rate)
    max_frames: int = 1200         # hard cap on synthesis frame capacity

    def __post_init__(self):
        self._frontend_cache: Dict = {}
        self._synth_cache: Dict = {}
        self.cleaner = TextCleaner()
        # PL-BERT runtime position capacity >= 1024 (PLBERT_MAX_POSITION env
        # override honoured), grown by repeating the last learned row
        # (ref: Utils/PLBERT/util.py:8-20, 31-65).
        import os as _os

        from .models.plbert import resize_position_embeddings

        target = max(int(_os.environ.get("PLBERT_MAX_POSITION", 0) or 0), 1024)
        if "bert" in self.zoo:
            self.zoo = dict(self.zoo)
            self.zoo["bert"] = resize_position_embeddings(self.zoo["bert"], target)

    # -- tokenization -----------------------------------------------------
    def tokens_from_phonemes(self, phonemes: str) -> np.ndarray:
        toks = self.cleaner(phonemes)
        toks.insert(0, 0)
        return np.asarray(toks, dtype=np.int32)

    # -- stage 1 ----------------------------------------------------------
    def _frontend_fn(self, length: int, num_steps: int, embedding_scale: float,
                     use_ref: bool):
        mp = self.model_params
        style_dim = mp.style_dim

        def fn(zoo, tokens, lengths, key, noise, ref_s, s_prev, prev_mix):
            mask = jnp.arange(length)[None, :] < lengths[:, None]
            t_en = text_encoder_apply(zoo["text_encoder"], tokens, lengths)
            bert_dur = plbert_apply(zoo["bert"], tokens, mask.astype(jnp.int32),
                                    self.plbert_cfg)
            d_en = jnp.swapaxes(
                linear(bert_dur, zoo["bert_encoder"]["weight"], zoo["bert_encoder"]["bias"]),
                1, 2)

            def net(x, c_noise):
                # mask: the reference infers at exact length (demo cell 17);
                # excluding pad keys reproduces that at bucketed shapes
                return denoiser_cfg_apply(
                    zoo["diffusion"]["transformer"], x, c_noise, bert_dur,
                    embedding_scale=embedding_scale,
                    features=ref_s if (use_ref and mp.multispeaker) else None,
                    num_heads=mp.diffusion.transformer.num_heads,
                    style_conditioned=mp.multispeaker,
                    mask=mask,
                )

            fn_denoise = S.k_denoise_fn(net, self.sigma_data)
            sigmas = S.karras_schedule(num_steps)
            # the reference samples styles UNclamped (demo cell 14 and
            # train_second.py:418-422 build DiffusionSampler with clamp=False)
            s_pred = S.adpm2_sample(key, noise, fn_denoise, sigmas, num_steps,
                                    clamp=False)[:, 0, :]

            # long-form style carry-over: s_pred <- t*s_prev + (1-t)*s_pred
            s_pred = jnp.where(prev_mix > 0, prev_mix * s_prev + (1 - prev_mix) * s_pred,
                               s_pred)

            s = s_pred[:, style_dim:]
            ref = s_pred[:, :style_dim]
            if use_ref:
                alpha, beta = self._alpha, self._beta
                ref = alpha * ref + (1 - alpha) * ref_s[:, :style_dim]
                s = beta * s + (1 - beta) * ref_s[:, style_dim:]
            s_out = jnp.concatenate([ref, s], axis=-1)

            d = duration_encoder_apply(zoo["predictor"]["text_encoder"], d_en, s,
                                       lengths, mp.n_layer)
            x = bilstm(zoo["predictor"]["lstm"], d, lengths)
            proj = zoo["predictor"]["duration_proj"]["linear_layer"]
            dur_logits = linear(x, proj["weight"], proj["bias"])
            duration = jax.nn.sigmoid(dur_logits).sum(axis=-1)
            pred_dur = jnp.maximum(jnp.round(duration), 1.0)
            pred_dur = jnp.where(mask, pred_dur, 0.0)
            # reference pads the final token's duration (LJSpeech demo)
            if self.last_token_pad:
                last = lengths - 1
                onehot = jnp.arange(length)[None, :] == last[:, None]
                pred_dur = pred_dur + self.last_token_pad * onehot
            return t_en, d, s, ref, s_out, pred_dur.astype(jnp.int32)

        return jax.jit(fn)

    # -- stage 2 ----------------------------------------------------------
    def _synth_fn(self, length: int, t_mel: int, noisy_source: bool = False):
        """``noisy_source``: thread a PRNG key into the vocoder's harmonic
        source so SineGen's dither is drawn like the reference's inference
        (ref: Modules/istftnet.py:237-246 adds it unconditionally); the
        default keeps the engine's fully deterministic zero-dither path."""
        mp = self.model_params
        decoder_mod = istftnet if mp.decoder.type == "istftnet" else hifigan

        def fn(zoo, t_en, d, s, ref, pred_dur, lengths, source_key=None):
            if self.compute_dtype is not None:
                # vocoder runs at MXU bf16 rate; STFT/phase paths re-pin fp32
                t_en, d, s, ref = (x.astype(self.compute_dtype) for x in (t_en, d, s, ref))
            token_mask = (jnp.arange(length)[None, :] < lengths[:, None]).astype(jnp.float32)
            aln = hard_alignment(pred_dur, t_mel, token_mask)
            if self.compute_dtype is not None:
                aln = aln.astype(self.compute_dtype)
            en = jnp.swapaxes(d, 1, 2) @ aln
            asr = t_en @ aln
            if mp.decoder.type == "hifigan":
                # one-frame right shift (Inference_LibriTTS.ipynb cell 16)
                def shift(z):
                    return jnp.concatenate([z[..., :1], z[..., :-1]], axis=-1)
                en = shift(en)
                asr = shift(asr)
            frames = pred_dur.sum(axis=1)
            f0, n = prosody_f0n_apply(zoo["predictor"], en, s, lengths=frames)
            wav = decoder_mod.decoder_apply(zoo["decoder"], mp.decoder, asr, f0, n,
                                            ref, key=source_key, lengths=frames,
                                            fused=True)
            return wav[:, 0, :]

        if noisy_source:
            return jax.jit(fn)
        return jax.jit(lambda zoo, t_en, d, s, ref, pred_dur, lengths: fn(
            zoo, t_en, d, s, ref, pred_dur, lengths, None))

    # -- public API -------------------------------------------------------
    def synthesize(
        self,
        phonemes,                       # str or list[str]
        key: Optional[jax.Array] = None,
        noise: Optional[np.ndarray] = None,
        diffusion_steps: int = 5,
        embedding_scale: float = 1.0,
        ref_s: Optional[np.ndarray] = None,
        alpha: float = 0.3,
        beta: float = 0.7,
        s_prev: Optional[np.ndarray] = None,
        prev_blend: float = 0.0,
        trim_tail: int = 0,
        return_styles: bool = False,
        source_key: Optional[jax.Array] = None,   # vocoder dither (see _synth_fn)
    ):
        """Phoneme strings -> list of waveforms (24 kHz numpy, trimmed to each
        sample's true length)."""
        single = isinstance(phonemes, str)
        texts = [phonemes] if single else list(phonemes)
        toks = [self.tokens_from_phonemes(p) for p in texts]
        b = len(toks)
        lengths = np.array([len(t) for t in toks], dtype=np.int32)
        cap = _round_up(int(lengths.max()), self.token_bucket)
        tokens = np.zeros((b, cap), dtype=np.int32)
        for i, t in enumerate(toks):
            tokens[i, : len(t)] = t

        if key is None:
            key = jax.random.PRNGKey(0)
        k_noise, k_samp = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(k_noise, (b, 1, self.model_params.style_dim * 2))
        else:
            noise = jnp.asarray(noise)
        if self.input_sharding is not None:
            tokens = jax.device_put(tokens, self.input_sharding)
            noise = jax.device_put(noise, self.input_sharding)

        use_ref = ref_s is not None
        self._alpha, self._beta = alpha, beta
        fkey = (cap, diffusion_steps, float(embedding_scale), use_ref,
                alpha if use_ref else None, beta if use_ref else None)
        if fkey not in self._frontend_cache:
            self._frontend_cache[fkey] = self._frontend_fn(
                cap, diffusion_steps, embedding_scale, use_ref)
        ref_in = jnp.zeros((b, self.model_params.style_dim * 2)) if ref_s is None \
            else jnp.asarray(ref_s)
        sp_in = jnp.zeros_like(ref_in) if s_prev is None else jnp.asarray(s_prev)
        t_en, d, s, ref, s_out, pred_dur = self._frontend_cache[fkey](
            self.zoo, jnp.asarray(tokens), jnp.asarray(lengths), k_samp, noise,
            ref_in, sp_in, jnp.float32(prev_blend if s_prev is not None else 0.0))

        # Speculative frame capacity: launch the synthesis stage immediately
        # with a capacity predicted from text length, and overlap the
        # pred_dur device->host sync with vocoder execution.  Only when the
        # speculation is too small (rare with adequate headroom) do we pay a
        # second synthesis at the exact bucket.
        spec_cap = _round_up(
            min(int(lengths.max()) * self.duration_headroom + self.frame_bucket,
                self.max_frames),
            self.frame_bucket)
        noisy = source_key is not None
        s_args = (source_key,) if noisy else ()
        skey = (cap, spec_cap, noisy)
        if skey not in self._synth_cache:
            self._synth_cache[skey] = self._synth_fn(cap, spec_cap, noisy)
        wav_dev = self._synth_cache[skey](self.zoo, t_en, d, s, ref, pred_dur,
                                          jnp.asarray(lengths), *s_args)
        pred_dur_np = np.asarray(pred_dur)          # overlaps with synth
        frames = pred_dur_np.sum(axis=1)
        if int(frames.max()) > spec_cap:
            t_mel = _round_up(int(frames.max()), self.frame_bucket)
            skey = (cap, t_mel, noisy)
            if skey not in self._synth_cache:
                self._synth_cache[skey] = self._synth_fn(cap, t_mel, noisy)
            wav_dev = self._synth_cache[skey](self.zoo, t_en, d, s, ref, pred_dur,
                                              jnp.asarray(lengths), *s_args)
        wav = np.asarray(wav_dev)

        outs = []
        # durations are at the en rate (mel/2): the decoder upsamples 2x to
        # mel rate then 300x to audio, i.e. 600 samples per duration frame
        samples_per_frame = 600
        for i in range(b):
            n = int(frames[i]) * samples_per_frame
            w = wav[i, :n]
            if trim_tail:
                w = w[:-trim_tail]
            outs.append(w)
        if return_styles:
            styles = np.asarray(s_out)
            return (outs[0], styles[0]) if single else (outs, styles)
        return outs[0] if single else outs

    def compute_style(self, wave_24k: np.ndarray) -> np.ndarray:
        """Reference audio -> concat(acoustic, prosodic) style (1, 2*style_dim)
        (Demo/Inference_LibriTTS.ipynb cell 5 ``compute_style``)."""
        from .audio.mel import DATASET_MEL, log_mel_spectrogram
        from .models.style_encoder import style_encoder_apply

        mel = log_mel_spectrogram(jnp.asarray(np.asarray(wave_24k)[None]), DATASET_MEL)
        acoustic = style_encoder_apply(self.zoo["style_encoder"], mel[:, None])
        prosodic = style_encoder_apply(self.zoo["predictor_encoder"], mel[:, None])
        return np.concatenate([np.asarray(acoustic), np.asarray(prosodic)], axis=-1)

    def style_transfer(self, phonemes, ref_s, alpha: float = 0.3,
                       beta: float = 0.7, **kw):
        """STinference (Demo/Inference_LibriTTS.ipynb cell 45): synthesize
        target text carrying the reference speaker's style mix."""
        return self.synthesize(phonemes, ref_s=ref_s, alpha=alpha, beta=beta, **kw)

    def warmup(self, token_caps=(32, 64), frame_caps=(200, 400),
               diffusion_steps=(5,), batch: int = 1, key=None):
        """Pre-compile the (token, frame, steps) shape buckets a server will
        hit, so first requests do not pay XLA compilation."""
        key = key if key is not None else jax.random.PRNGKey(0)
        for steps in diffusion_steps:
            for tc in token_caps:
                phon = "a" * (tc - 2)
                for fc in frame_caps:
                    fkey = (tc, steps, 1.0, False, None, None)
                    if fkey not in self._frontend_cache:
                        self._frontend_cache[fkey] = self._frontend_fn(tc, steps, 1.0, False)
                    if (tc, fc, False) not in self._synth_cache:
                        self._synth_cache[(tc, fc, False)] = self._synth_fn(tc, fc)
                # trigger compilation through a real call at the largest cap
                self.synthesize([phon] * batch, key=key, diffusion_steps=steps)

    def long_form(self, sentences, key=None, t: float = 0.7, **kw):
        """LFinference: per-sentence synthesis with style carry-over
        (Demo/Inference_LJSpeech.ipynb cell 29)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        s_prev = None
        pieces = []
        for i, sent in enumerate(sentences):
            wav, s_prev = self.synthesize(
                sent, key=jax.random.fold_in(key, i), s_prev=s_prev,
                prev_blend=t if s_prev is not None else 0.0,
                return_styles=True, **kw)
            pieces.append(wav)
        return np.concatenate(pieces)
