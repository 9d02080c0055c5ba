"""Golden tests: JAX PLBERT / Whisper encoders vs HF transformers (torch CPU)
with shared random weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from styletts2_tpu.models.plbert import PLBertConfig, plbert_apply
from styletts2_tpu.models.whisper import (
    WhisperConfig,
    whisper_encoder_apply,
    whisper_log_mel,
    slaney_fbanks,
)
from styletts2_tpu.train.torch_compat import convert_module_state, nest, to_numpy_state


def test_plbert_matches_hf_albert():
    from transformers import AlbertConfig, AlbertModel

    hf_cfg = AlbertConfig(
        vocab_size=178, hidden_size=96, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=64,
        num_hidden_layers=3, embedding_size=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = AlbertModel(hf_cfg)
    model.eval()

    ids = torch.randint(0, 178, (2, 10))
    mask = torch.ones(2, 10, dtype=torch.long)
    mask[1, 7:] = 0
    with torch.no_grad():
        want = model(input_ids=ids, attention_mask=mask,
                     token_type_ids=torch.zeros_like(ids)).last_hidden_state

    params = nest(to_numpy_state(model.state_dict()))
    cfg = PLBertConfig(vocab_size=178, embedding_size=32, hidden_size=96,
                       num_attention_heads=4, intermediate_size=128,
                       max_position_embeddings=64, num_hidden_layers=3)
    got = plbert_apply(params, jnp.asarray(ids.numpy()),
                       jnp.asarray(mask.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)


def test_whisper_encoder_matches_hf():
    from transformers import WhisperConfig as HFWhisperConfig, WhisperModel

    hf_cfg = HFWhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=96, max_source_positions=50,
        decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=96,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(1)
    model = WhisperModel(hf_cfg)
    model.eval()

    feats = torch.randn(2, 80, 100)
    with torch.no_grad():
        out = model.encoder(input_features=feats, output_hidden_states=True)
    want_states = [h.numpy() for h in out.hidden_states]

    enc_state = {k[len("encoder."):]: v for k, v in model.state_dict().items()
                 if k.startswith("encoder.")}
    params = nest(to_numpy_state(enc_state))
    cfg = WhisperConfig(n_mels=80, d_model=64, num_layers=2, num_heads=4,
                        ffn_dim=96, max_source_positions=50)
    got_states = whisper_encoder_apply(params, jnp.asarray(feats.numpy()), cfg)

    assert len(got_states) == len(want_states) == 3
    for got, want in zip(got_states, want_states):
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=1e-3)


def test_whisper_log_mel_matches_reference_math():
    """The reference's custom Whisper log-mel (losses.py:252-268): torch.stft
    power spectrum @ slaney fbanks, log10 floor 1e-10, no normalization."""
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    got = whisper_log_mel(jnp.asarray(audio))

    window = torch.hann_window(400)
    stft = torch.stft(torch.tensor(audio), 400, 160, 400, window=window,
                      center=True, pad_mode="reflect", return_complex=True)
    mag = stft.abs() ** 2
    fb = torch.tensor(slaney_fbanks(201, 80))
    mel = torch.matmul(mag.transpose(1, 2), fb).transpose(1, 2)
    want = torch.log10(torch.clamp(mel, min=1e-10))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-3, rtol=1e-3)


def test_slaney_fbanks_match_hf_feature_extractor():
    """Validate the slaney filterbank against the HF implementation."""
    from transformers.audio_utils import mel_filter_bank

    want = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    )
    got = slaney_fbanks(201, 80)
    np.testing.assert_allclose(got, want.T if want.shape == (80, 201) else want,
                               atol=1e-6, rtol=1e-5)


def test_resample_preserves_tone():
    from styletts2_tpu.audio.resample import resample

    t = np.arange(24000 * 1) / 24000.0
    sine = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
    out = np.asarray(resample(jnp.asarray(sine), 24000, 16000))
    assert out.shape == (1, 16000)
    # The 440 Hz tone must survive with the right frequency & amplitude
    spec = np.abs(np.fft.rfft(out[0, 2000:14000] * np.hanning(12000)))
    peak_hz = spec.argmax() * 16000 / 12000
    assert abs(peak_hz - 440.0) < 4.0
    assert np.max(np.abs(out)) == pytest.approx(1.0, abs=0.05)
