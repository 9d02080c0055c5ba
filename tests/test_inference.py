"""End-to-end inference slice tests on a tiny model configuration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.config import (
    DecoderConfig,
    DiffusionConfig,
    DiffusionTransformerConfig,
    ModelParams,
)
from styletts2_tpu.infer import InferenceEngine
from styletts2_tpu.models.asr import ASRConfig
from styletts2_tpu.models.jdc import JDCConfig
from styletts2_tpu.models.plbert import PLBertConfig
from styletts2_tpu.models.whisper import WhisperConfig
from styletts2_tpu.models.zoo import build_zoo


def tiny_setup(multispeaker=False, decoder_type="istftnet"):
    if decoder_type == "istftnet":
        dec = DecoderConfig(upsample_initial_channel=32)
    else:
        dec = DecoderConfig(type="hifigan", upsample_rates=(10, 5, 3, 2),
                            upsample_kernel_sizes=(20, 10, 6, 4),
                            upsample_initial_channel=32)
    mp = ModelParams(
        multispeaker=multispeaker, dim_in=4, hidden_dim=32, max_conv_dim=32,
        n_layer=1, n_token=179, max_dur=10, style_dim=16, decoder=dec,
        diffusion=DiffusionConfig(transformer=DiffusionTransformerConfig(
            num_layers=1, num_heads=2, head_features=8, multiplier=1)),
    )
    plbert = PLBertConfig(vocab_size=179, embedding_size=8, hidden_size=24,
                          num_attention_heads=2, intermediate_size=32,
                          max_position_embeddings=64, num_hidden_layers=1)
    zoo = build_zoo(
        jax.random.PRNGKey(0), mp, plbert,
        asr_cfg=ASRConfig(hidden_dim=32, n_layers=1, n_token=179,
                          token_embedding_dim=16, location_kernel_size=7),
        jdc_cfg=JDCConfig(lstm_hidden=8, lstm_layers=1),
        include_slm=False,
        # generator input channels = decoder width // 2 = upsample_initial_channel
        decoder_width=64, decoder_asr_res_ch=8,
    )
    return zoo, mp, plbert


@pytest.mark.parametrize("decoder_type", ["istftnet", "hifigan"])
def test_engine_single_and_batched(decoder_type):
    zoo, mp, plbert = tiny_setup(decoder_type=decoder_type)
    eng = InferenceEngine(zoo, mp, plbert, frame_bucket=50)
    wav = eng.synthesize("ola tu", key=jax.random.PRNGKey(1), diffusion_steps=3)
    assert wav.ndim == 1 and wav.shape[0] % 300 == 0 and wav.shape[0] > 0
    assert np.isfinite(wav).all()

    outs = eng.synthesize(["ola tu", "bonjur mes amis"], key=jax.random.PRNGKey(2),
                          diffusion_steps=3)
    assert len(outs) == 2
    assert all(np.isfinite(w).all() for w in outs)
    # longer text should synthesize at least as many frames
    assert outs[1].shape[0] >= outs[0].shape[0] - 300 * 6


def test_engine_cfg_and_multispeaker():
    zoo, mp, plbert = tiny_setup(multispeaker=True, decoder_type="hifigan")
    eng = InferenceEngine(zoo, mp, plbert, frame_bucket=50)
    ref_s = np.random.default_rng(0).standard_normal((1, 32)).astype(np.float32) * 0.1
    wav = eng.synthesize("ola tu", key=jax.random.PRNGKey(1), diffusion_steps=3,
                         embedding_scale=2.0, ref_s=ref_s, alpha=0.3, beta=0.7)
    assert np.isfinite(wav).all()


def test_long_form_concatenates():
    zoo, mp, plbert = tiny_setup()
    eng = InferenceEngine(zoo, mp, plbert, frame_bucket=50)
    wav = eng.long_form(["ola tu", "mes amis"], key=jax.random.PRNGKey(3),
                        diffusion_steps=3)
    assert wav.ndim == 1 and np.isfinite(wav).all()


def test_compute_style_and_style_transfer():
    zoo, mp, plbert = tiny_setup(multispeaker=True, decoder_type="hifigan")
    eng = InferenceEngine(zoo, mp, plbert, frame_bucket=50)
    wave = np.random.default_rng(0).standard_normal(80 * 300).astype(np.float32) * 0.1
    ref_s = eng.compute_style(wave)
    assert ref_s.shape == (1, 2 * mp.style_dim)
    wav = eng.style_transfer("ola tu", ref_s, key=jax.random.PRNGKey(0),
                             diffusion_steps=3)
    assert np.isfinite(wav).all()


def test_speculative_capacity_fallback():
    """Force the speculative frame capacity to be too small: the engine must
    fall back to the exact bucket and still produce full-length audio."""
    zoo, mp, plbert = tiny_setup()
    eng = InferenceEngine(zoo, mp, plbert, frame_bucket=50)
    eng.duration_headroom = 1          # guaranteed under-prediction
    wav_spec = eng.synthesize("ola tu bonjur", key=jax.random.PRNGKey(4),
                              diffusion_steps=3)
    eng2 = InferenceEngine(zoo, mp, plbert, frame_bucket=50)  # generous default
    wav_ref = eng2.synthesize("ola tu bonjur", key=jax.random.PRNGKey(4),
                              diffusion_steps=3)
    assert wav_spec.shape == wav_ref.shape
    np.testing.assert_allclose(wav_spec, wav_ref, atol=1e-4)
