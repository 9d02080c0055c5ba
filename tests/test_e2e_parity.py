"""End-to-end inference parity: tokens -> waveform through BOTH
implementations with one set of converted random weights.

The round-2 harness proved every *module* against the reference
(test_reference_parity.py); this test proves the **composition** — the glue
the demo notebook writes by hand (Demo/Inference_LJSpeech.ipynb cell 17):

    tokens -> text_encoder + PL-BERT -> bert_encoder
           -> 5-step KarrasSchedule/ADPM2 style sampling (clamp=False)
           -> style split s_pred[:, 128:] / s_pred[:, :128]
           -> duration: sigmoid.sum -> round -> clamp(min=1) -> last += 5
           -> hard alignment expansion -> F0Ntrain -> decoder -> waveform

on the full-size LJSpeech architecture (512-ch text encoder, 768-d BERT,
256-d diffusion transformer, 128-d styles, full iSTFTNet decoder), and the
BASELINE.md gate on the composition: log-mel L1 < 1e-2.

Our side runs through the PUBLIC InferenceEngine.synthesize() API with its
bucketed padding (tokens pad to a 32-bucket), so this also proves the
padded-shape path (denoiser token masking) reproduces the reference's
exact-length batch-1 computation.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))
from reference_compat import load_reference, to_jax_params  # noqa: E402

from styletts2_tpu.config import ModelParams
from styletts2_tpu.infer import InferenceEngine
from styletts2_tpu.models.plbert import PLBertConfig
from styletts2_tpu.train.torch_compat import nest, to_numpy_state

ref = load_reference()

KEY = jax.random.PRNGKey(7)
SIGMA_DATA = 0.2
STEPS = 5
PHONEMES = "ə tɛst"  # short: full-size decoder frames stay CPU-affordable


def _build_torch_side():
    """Full-size LJSpeech components (PL-BERT shrunk to 3 shared-param
    layers — depth exercises no extra glue).

    Untrained nets are then nudged to *trained-like output statistics*:
    the iSTFTNet decoder exponentiates its log-magnitude head, so with raw
    random init the composition is numerically chaotic (fp drift amplifies
    through exp; measured: the two implementations agree on every decoder
    INPUT to 1e-5 yet the waveforms diverge by e^8).  Scaling the output
    projections — styles to the ~0.1 regime the module parity tests
    validate, F0 to a realistic ~120 Hz voiced band, the pre-exp conv_post
    toward unit magnitude — keeps every intermediate in the regime real
    checkpoints produce, while both sides still see byte-identical weights
    (conversion happens after the rescale), so the glue under test is
    unchanged."""
    from transformers import AlbertConfig, AlbertModel

    torch.manual_seed(11)
    text_encoder = ref.models.TextEncoder(channels=512, kernel_size=5,
                                          depth=3, n_symbols=178).eval()
    bert = AlbertModel(AlbertConfig(
        vocab_size=178, embedding_size=128, hidden_size=768,
        num_attention_heads=12, intermediate_size=2048, num_hidden_layers=3,
        max_position_embeddings=512, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)).eval()
    bert_encoder = torch.nn.Linear(768, 512).eval()
    predictor = ref.models.ProsodyPredictor(style_dim=128, d_hid=512,
                                            nlayers=3, max_dur=50).eval()
    decoder = ref.istftnet.Decoder(dim_in=512, style_dim=128, dim_out=80).eval()
    transformer = ref.diff_modules.Transformer1d(
        num_layers=3, channels=256, num_heads=8, head_features=64,
        multiplier=2, context_embedding_features=768,
        embedding_max_length=512, context_features=None).eval()

    with torch.no_grad():
        # realistic voiced F0 (~60 Hz) and small energy.  Low F0 + short
        # durations bound the fp32 phase-accumulation drift of the harmonic
        # source (phase = cumsum(f0/fs) — at radians ~ O(1e3) the two
        # implementations' summation orders decorrelate the signal tail)
        predictor.F0_proj.weight *= 0.05
        predictor.F0_proj.bias.fill_(60.0)
        predictor.N_proj.weight *= 0.1
        # ~1-2 frames/token (sigmoid(-4) * 50 ≈ 0.9, round/clamp -> 1): a
        # ~0.3 s utterance — the same signal length the decoder module
        # parity test calibrated its fp32 tolerance envelope at (phase
        # drift of the harmonic source grows ~linearly with length)
        predictor.duration_proj.linear_layer.weight *= 0.05
        predictor.duration_proj.linear_layer.bias.fill_(-4.0)
        # styles into the ~0.1 regime (denoiser output head)
        for m in transformer.to_out.modules():
            if hasattr(m, "weight") and m.weight is not None:
                m.weight *= 0.1
                if m.bias is not None:
                    m.bias *= 0.1
        # pre-exp log-magnitude head toward unit magnitudes
        decoder.generator.conv_post.weight_g *= 0.1
        decoder.generator.conv_post.bias *= 0.1
    return text_encoder, bert, bert_encoder, predictor, decoder, transformer


def _torch_inference(mods, tokens_np, noise_np, step_noises, source_draws,
                     monkeypatch):
    """The demo cell-17 glue, verbatim semantics.

    ``source_draws``: (rand_ini, sine_noise, src_noise) taken from OUR
    engine's fold_in stream and injected into torch's SineGen, so both sides
    see identical vocoder dither.  Dither must be NONZERO: with a zero-dither
    pure-tone source, all non-harmonic STFT bins have ~zero magnitude, their
    atan2 phases are fp rounding residue, and those garbage phase channels
    feed the generator's noise convs directly — the comparison becomes
    numerically chaotic on both sides (measured: every decoder input matches
    to 1e-5, waveforms diverge ~60%)."""
    text_encoder, bert, bert_encoder, predictor, decoder, transformer = mods
    rand_ini, sine_noise, src_noise = (torch.tensor(a) for a in source_draws)

    diffusion = ref.diff_sampler.KDiffusion(
        net=transformer,
        sigma_distribution=ref.diff_sampler.LogNormalDistribution(-3.0, 1.0),
        sigma_data=SIGMA_DATA)
    sampler = ref.diff_sampler.DiffusionSampler(
        diffusion, sampler=ref.diff_sampler.ADPM2Sampler(),
        sigma_schedule=ref.diff_sampler.KarrasSchedule(
            sigma_min=1e-4, sigma_max=3.0, rho=9.0),
        num_steps=STEPS, clamp=False)

    # randn_like serves two masters: the ADPM2 steps (inject our fold_in
    # stream) and the vocoder source dither (our sine/source draws, matched
    # by shape)
    it = iter([torch.tensor(n) for n in step_noises])

    def fake_randn_like(t, **k):
        if t.shape == (1, 1, 256):
            return next(it)
        if t.shape == sine_noise.shape:
            return sine_noise
        if t.shape == src_noise.shape:
            return src_noise
        raise AssertionError(f"unexpected randn_like shape {t.shape}")

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    monkeypatch.setattr(torch, "rand", lambda *a, **k: rand_ini)

    tokens = torch.tensor(tokens_np[None], dtype=torch.long)
    with torch.no_grad():
        input_lengths = torch.tensor([tokens.shape[-1]], dtype=torch.long)
        text_mask = text_encoder.length_to_mask(input_lengths)

        t_en = text_encoder(tokens, input_lengths, text_mask)
        bert_dur = bert(tokens, attention_mask=(~text_mask).int()).last_hidden_state
        d_en = bert_encoder(bert_dur).transpose(-1, -2)

        s_pred = sampler(torch.tensor(noise_np),
                         embedding=bert_dur[0].unsqueeze(0),
                         num_steps=STEPS, embedding_scale=1.0).squeeze(0)
        s = s_pred[:, 128:]
        ref_sty = s_pred[:, :128]

        d = predictor.text_encoder(d_en, s, input_lengths, text_mask)
        x, _ = predictor.lstm(d)
        duration = predictor.duration_proj(x)
        duration = torch.sigmoid(duration).sum(axis=-1)
        pred_dur = torch.round(duration.squeeze()).clamp(min=1)
        pred_dur[-1] += 5

        pred_aln_trg = torch.zeros(int(input_lengths), int(pred_dur.sum().item()))
        c_frame = 0
        for i in range(pred_aln_trg.size(0)):
            pred_aln_trg[i, c_frame:c_frame + int(pred_dur[i].item())] = 1
            c_frame += int(pred_dur[i].item())

        en = d.transpose(-1, -2) @ pred_aln_trg.unsqueeze(0)
        F0_pred, N_pred = predictor.F0Ntrain(en, s)
        out = decoder(t_en @ pred_aln_trg.unsqueeze(0), F0_pred, N_pred, ref_sty)
    return out.squeeze().numpy(), np.asarray(pred_dur, np.int64)


def test_e2e_inference_chain_parity(monkeypatch):
    mods = _build_torch_side()
    text_encoder, bert, bert_encoder, predictor, decoder, transformer = mods

    zoo = {
        "text_encoder": to_jax_params(text_encoder),
        "bert": nest(to_numpy_state(bert.state_dict())),
        "bert_encoder": to_jax_params(bert_encoder),
        "predictor": to_jax_params(predictor),
        "decoder": to_jax_params(decoder),
        "diffusion": {"transformer": to_jax_params(transformer)},
    }
    mp = ModelParams()   # full-size LJSpeech defaults
    plbert_cfg = PLBertConfig(vocab_size=178, embedding_size=128,
                              hidden_size=768, num_attention_heads=12,
                              intermediate_size=2048,
                              max_position_embeddings=512, num_hidden_layers=3)
    engine = InferenceEngine(zoo, mp, plbert_cfg, sigma_data=SIGMA_DATA)

    tokens = engine.tokens_from_phonemes(PHONEMES)
    assert 4 <= len(tokens) < 32  # pads to the 32-bucket: exercises masking

    # the engine splits the key; reproduce its sampling stream for torch
    k_noise, k_samp = jax.random.split(KEY)
    noise = np.asarray(jax.random.normal(k_noise, (1, 1, 256)), np.float32)
    step_noises = [np.asarray(jax.random.normal(
        jax.random.fold_in(k_samp, i), (1, 1, 256)), np.float32)
        for i in range(STEPS - 1)]

    # the engine's vocoder dither stream (source.py fold_in 0/1/2), drawn at
    # the engine's PADDED frame capacity and sliced to the true length the
    # exact-length torch run will see (a prefix slice of the padded draw)
    skey = jax.random.PRNGKey(402)
    spec_cap = 200         # _round_up(min(6 tokens * 10 + 100, 1200), 100)
    t_audio_pad = spec_cap * 600
    harmonics = 9
    rand_ini = np.array(jax.random.uniform(
        jax.random.fold_in(skey, 0), (1, harmonics)), np.float32)
    rand_ini[:, 0] = 0.0
    sine_full = np.asarray(jax.random.normal(
        jax.random.fold_in(skey, 1), (1, t_audio_pad, harmonics)), np.float32)
    src_full = np.asarray(jax.random.normal(
        jax.random.fold_in(skey, 2), (1, t_audio_pad, 1)), np.float32)

    wav_o = engine.synthesize(PHONEMES, key=KEY, noise=noise,
                              diffusion_steps=STEPS, embedding_scale=1.0,
                              source_key=skey)
    t_audio = len(wav_o)

    wav_t, pred_dur_t = _torch_inference(
        mods, tokens, noise, step_noises,
        (rand_ini, sine_full[:, :t_audio], src_full[:, :t_audio]), monkeypatch)

    # total predicted frames must agree exactly (durations are integers;
    # engine output is trimmed to sum(pred_dur) * 600 samples)
    assert wav_o.shape[0] == int(pred_dur_t.sum()) * 600, (
        wav_o.shape, pred_dur_t.sum())

    tmin = min(len(wav_o), len(wav_t))
    wav_o, wav_t = wav_o[:tmin], wav_t[:tmin]
    err = np.abs(wav_o - wav_t)

    # same envelope as test_istftnet_decoder_parity: STFT frame 0 of the
    # harmonic source sits on the atan2 branch cut (the reference's own
    # f32-vs-f64 spread there is 0.176); the body must track tightly.  The
    # final TAIL samples are excluded: the engine computes at a padded frame
    # capacity, so convs near the true-length boundary see the padded
    # region's (noisy, f0=0) source instead of the exact-length run's edge
    # padding — a receptive-field-bounded effect, not composition error.
    tail = 2000
    assert err[:700].max() < 0.35, f"head err {err[:700].max()}"
    np.testing.assert_allclose(wav_o[700:-tail], wav_t[700:-tail],
                               atol=5e-3, rtol=1e-3,
                               err_msg="e2e waveform body")

    # BASELINE.md gate on the full composition: log-mel L1 < 1e-2
    from styletts2_tpu.audio.mel import log_mel_spectrogram
    mel_o = np.asarray(log_mel_spectrogram(jnp.asarray(wav_o[None, :-tail])))
    mel_t = np.asarray(log_mel_spectrogram(jnp.asarray(wav_t[None, :-tail])))
    mel_l1 = np.abs(mel_o - mel_t).mean()
    assert mel_l1 < 1e-2, f"e2e mel L1 {mel_l1}"


# ---------------------------------------------------------------------------
# Multispeaker (LibriTTS / HiFi-GAN) chain
# ---------------------------------------------------------------------------

def _build_torch_side_multispeaker():
    """Full-size LibriTTS components: StyleTransformer1d denoiser conditioned
    on the 256-d reference style, HiFi-GAN decoder.  Same trained-like output
    rescales as the LJSpeech builder (docstring there); the HiFi-GAN output
    is tanh-bounded so no conv_post rescale is needed."""
    from transformers import AlbertConfig, AlbertModel

    torch.manual_seed(23)
    text_encoder = ref.models.TextEncoder(channels=512, kernel_size=5,
                                          depth=3, n_symbols=178).eval()
    bert = AlbertModel(AlbertConfig(
        vocab_size=178, embedding_size=128, hidden_size=768,
        num_attention_heads=12, intermediate_size=2048, num_hidden_layers=3,
        max_position_embeddings=512, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)).eval()
    bert_encoder = torch.nn.Linear(768, 512).eval()
    predictor = ref.models.ProsodyPredictor(style_dim=128, d_hid=512,
                                            nlayers=3, max_dur=50).eval()
    decoder = ref.hifigan.Decoder(dim_in=512, style_dim=128, dim_out=80).eval()
    transformer = ref.diff_modules.StyleTransformer1d(
        num_layers=3, channels=256, num_heads=8, head_features=64,
        multiplier=2, context_embedding_features=768,
        embedding_max_length=512, context_features=256).eval()

    with torch.no_grad():
        predictor.F0_proj.weight *= 0.05
        predictor.F0_proj.bias.fill_(60.0)
        predictor.N_proj.weight *= 0.1
        predictor.duration_proj.linear_layer.weight *= 0.05
        # ~5 frames/token (sigmoid(-2.2)*50): a ~1 s utterance — long enough
        # that the chain is a real workout, short enough for the CPU decoder
        predictor.duration_proj.linear_layer.bias.fill_(-2.2)
        for m in transformer.to_out.modules():
            if hasattr(m, "weight") and m.weight is not None:
                m.weight *= 0.1
                if m.bias is not None:
                    m.bias *= 0.1
    return text_encoder, bert, bert_encoder, predictor, decoder, transformer


def _torch_inference_multispeaker(mods, tokens_np, noise_np, step_noises,
                                  ref_s_np, alpha, beta, monkeypatch):
    """The LibriTTS demo glue, verbatim semantics
    (Demo/Inference_LibriTTS.ipynb cell 16): StyleTransformer sampling with
    ``features=ref_s``, alpha/beta style mixing against ref_s, the
    hifigan one-frame right shift of ``en`` and ``asr``.  Vocoder dither is
    zeroed on both sides (the hifigan module-parity test proves that path);
    ADPM2 step noises come from OUR engine's fold_in stream."""
    text_encoder, bert, bert_encoder, predictor, decoder, transformer = mods
    ref_s = torch.tensor(ref_s_np)

    diffusion = ref.diff_sampler.KDiffusion(
        net=transformer,
        sigma_distribution=ref.diff_sampler.LogNormalDistribution(-3.0, 1.0),
        sigma_data=SIGMA_DATA)
    sampler = ref.diff_sampler.DiffusionSampler(
        diffusion, sampler=ref.diff_sampler.ADPM2Sampler(),
        sigma_schedule=ref.diff_sampler.KarrasSchedule(
            sigma_min=1e-4, sigma_max=3.0, rho=9.0),
        num_steps=STEPS, clamp=False)

    it = iter([torch.tensor(n) for n in step_noises])

    def fake_randn_like(t, **k):
        if t.shape == (1, 1, 256):
            return next(it)
        return torch.zeros_like(t)          # vocoder source dither -> 0

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.zeros(*a))

    tokens = torch.tensor(tokens_np[None], dtype=torch.long)
    with torch.no_grad():
        input_lengths = torch.tensor([tokens.shape[-1]], dtype=torch.long)
        text_mask = text_encoder.length_to_mask(input_lengths)

        t_en = text_encoder(tokens, input_lengths, text_mask)
        bert_dur = bert(tokens, attention_mask=(~text_mask).int()).last_hidden_state
        d_en = bert_encoder(bert_dur).transpose(-1, -2)

        s_pred = sampler(torch.tensor(noise_np),
                         embedding=bert_dur,
                         features=ref_s,
                         num_steps=STEPS, embedding_scale=1.0).squeeze(1)
        s = s_pred[:, 128:]
        ref_sty = s_pred[:, :128]
        ref_sty = alpha * ref_sty + (1 - alpha) * ref_s[:, :128]
        s = beta * s + (1 - beta) * ref_s[:, 128:]

        d = predictor.text_encoder(d_en, s, input_lengths, text_mask)
        x, _ = predictor.lstm(d)
        duration = predictor.duration_proj(x)
        duration = torch.sigmoid(duration).sum(axis=-1)
        pred_dur = torch.round(duration.squeeze()).clamp(min=1)
        # (text ends alphanumeric: the cell-16 "pred_dur[-1] = 1" branch for
        # trailing punctuation intentionally does not fire)

        pred_aln_trg = torch.zeros(int(input_lengths), int(pred_dur.sum().item()))
        c_frame = 0
        for i in range(pred_aln_trg.size(0)):
            pred_aln_trg[i, c_frame:c_frame + int(pred_dur[i].item())] = 1
            c_frame += int(pred_dur[i].item())

        en = d.transpose(-1, -2) @ pred_aln_trg.unsqueeze(0)
        asr_new = torch.zeros_like(en)
        asr_new[:, :, 0] = en[:, :, 0]
        asr_new[:, :, 1:] = en[:, :, 0:-1]
        en = asr_new

        F0_pred, N_pred = predictor.F0Ntrain(en, s)

        asr = t_en @ pred_aln_trg.unsqueeze(0)
        asr_new = torch.zeros_like(asr)
        asr_new[:, :, 0] = asr[:, :, 0]
        asr_new[:, :, 1:] = asr[:, :, 0:-1]
        asr = asr_new

        out = decoder(asr, F0_pred, N_pred, ref_sty)
    return out.squeeze().numpy(), np.asarray(pred_dur, np.int64)


def test_e2e_multispeaker_chain_parity(monkeypatch):
    """tokens -> StyleTransformer sampler (ref_s features) -> alpha/beta
    style mixing -> one-frame shift -> HiFi-GAN decoder -> waveform, both
    implementations, one set of converted weights (VERDICT round-4 item 6:
    the multispeaker glue proven, not smoked)."""
    import dataclasses

    from styletts2_tpu.config import DecoderConfig

    mods = _build_torch_side_multispeaker()
    text_encoder, bert, bert_encoder, predictor, decoder, transformer = mods

    zoo = {
        "text_encoder": to_jax_params(text_encoder),
        "bert": nest(to_numpy_state(bert.state_dict())),
        "bert_encoder": to_jax_params(bert_encoder),
        "predictor": to_jax_params(predictor),
        "decoder": to_jax_params(decoder),
        "diffusion": {"transformer": to_jax_params(transformer)},
    }
    mp = dataclasses.replace(
        ModelParams(), multispeaker=True,
        decoder=DecoderConfig(type="hifigan", upsample_rates=(10, 5, 3, 2),
                              upsample_kernel_sizes=(20, 10, 6, 4)))
    plbert_cfg = PLBertConfig(vocab_size=178, embedding_size=128,
                              hidden_size=768, num_attention_heads=12,
                              intermediate_size=2048,
                              max_position_embeddings=512, num_hidden_layers=3)
    # frame_bucket=1 + duration_headroom=1 force the speculative capacity to
    # miss, so the engine re-synthesizes at t_mel == sum(pred_dur) EXACTLY —
    # zero frame padding.  This isolates the multispeaker GLUE under test:
    # untrained AdaIN amplifies the legitimate padded-capacity boundary
    # effects ~100x beyond what trained weights produce (measured: masked
    # stats over a 6-valid-of-200 clip shift the whole waveform by ~0.4),
    # and the padded/masked machinery already has its own e2e gate in the
    # LJSpeech test above.  This also exercises the capacity-miss replay
    # path, which no other test covers.
    engine = InferenceEngine(zoo, mp, plbert_cfg, sigma_data=SIGMA_DATA,
                             last_token_pad=0, frame_bucket=1,
                             duration_headroom=1)

    alpha, beta = 0.3, 0.7
    rng = np.random.default_rng(31)
    ref_s = (rng.standard_normal((1, 256)) * 0.1).astype(np.float32)

    tokens = engine.tokens_from_phonemes(PHONEMES)
    assert 4 <= len(tokens) < 32

    k_noise, k_samp = jax.random.split(KEY)
    noise = np.asarray(jax.random.normal(k_noise, (1, 1, 256)), np.float32)
    step_noises = [np.asarray(jax.random.normal(
        jax.random.fold_in(k_samp, i), (1, 1, 256)), np.float32)
        for i in range(STEPS - 1)]

    wav_o = engine.synthesize(PHONEMES, key=KEY, noise=noise,
                              diffusion_steps=STEPS, embedding_scale=1.0,
                              ref_s=ref_s, alpha=alpha, beta=beta)

    wav_t, pred_dur_t = _torch_inference_multispeaker(
        mods, tokens, noise, step_noises, ref_s, alpha, beta, monkeypatch)

    # durations are integers; engine trims to sum(pred_dur) * 600 samples
    assert wav_o.shape[0] == int(pred_dur_t.sum()) * 600, (
        wav_o.shape, pred_dur_t.sum())

    tmin = min(len(wav_o), len(wav_t))
    wav_o_c, wav_t_c = wav_o[:tmin], wav_t[:tmin]

    # No iSTFT branch-cut head region here (HiFi-GAN synthesizes the
    # waveform directly) and no frame padding (exact capacity), so the
    # envelope applies over the whole signal.
    np.testing.assert_allclose(wav_o_c, wav_t_c, atol=5e-3, rtol=1e-3,
                               err_msg="multispeaker e2e waveform")

    # BASELINE.md gate on the full composition: log-mel L1 < 1e-2
    from styletts2_tpu.audio.mel import log_mel_spectrogram
    mel_o = np.asarray(log_mel_spectrogram(jnp.asarray(wav_o_c[None])))
    mel_t = np.asarray(log_mel_spectrogram(jnp.asarray(wav_t_c[None])))
    mel_l1 = np.abs(mel_o - mel_t).mean()
    assert mel_l1 < 1e-2, f"multispeaker e2e mel L1 {mel_l1}"
