"""Small model configurations for tests, dry runs, and CI.

These mirror the full architecture with every dimension shrunk so the whole
zoo compiles in seconds on a CPU mesh.
"""

from __future__ import annotations

import jax

from .config import (
    Config,
    DecoderConfig,
    DiffusionConfig,
    DiffusionTransformerConfig,
    ModelParams,
    SlmAdvParams,
    SlmConfig,
)
from .models.asr import ASRConfig
from .models.jdc import JDCConfig
from .models.plbert import PLBertConfig
from .models.whisper import WhisperConfig
from .models.zoo import build_zoo, zoo_configs


def tiny_whisper_cfg() -> WhisperConfig:
    return WhisperConfig(n_mels=80, d_model=16, num_layers=2, num_heads=2,
                         ffn_dim=24, max_source_positions=200)


def tiny_model_params(multispeaker: bool = False,
                      decoder_type: str = "istftnet") -> ModelParams:
    if decoder_type == "istftnet":
        dec = DecoderConfig(upsample_initial_channel=32)
    else:
        dec = DecoderConfig(type="hifigan", upsample_rates=(10, 5, 3, 2),
                            upsample_kernel_sizes=(20, 10, 6, 4),
                            upsample_initial_channel=32)
    return ModelParams(
        multispeaker=multispeaker, dim_in=4, hidden_dim=32, max_conv_dim=32,
        n_layer=1, n_token=179, max_dur=10, style_dim=16, decoder=dec,
        slm=SlmConfig(hidden=16, nlayers=3, initial_channel=4),
        diffusion=DiffusionConfig(transformer=DiffusionTransformerConfig(
            num_layers=1, num_heads=2, head_features=8, multiplier=1)),
    )


def tiny_zoo(multispeaker: bool = False, decoder_type: str = "istftnet",
             include_slm: bool = True, seed: int = 0):
    mp = tiny_model_params(multispeaker, decoder_type)
    plbert = PLBertConfig(vocab_size=179, embedding_size=8, hidden_size=24,
                          num_attention_heads=2, intermediate_size=32,
                          max_position_embeddings=64, num_hidden_layers=1)
    asr = ASRConfig(hidden_dim=32, n_layers=1, n_token=179,
                    token_embedding_dim=16, location_kernel_size=7)
    jdc = JDCConfig(lstm_hidden=8, lstm_layers=1)
    whisper = tiny_whisper_cfg()
    # jit the whole init: the eager build dispatches hundreds of one-op
    # programs at ~30 ms XLA-CPU compile each; jitted it is one program
    zoo = jax.jit(lambda k: build_zoo(
        k, mp, plbert, asr, jdc, whisper, include_slm=include_slm,
        decoder_width=64, decoder_asr_res_ch=8))(jax.random.PRNGKey(seed))
    cfgs = zoo_configs(mp, plbert, asr, jdc, whisper)
    return zoo, cfgs


def tiny_config() -> Config:
    return Config(
        batch_size=2, max_len=40,
        slmadv_params=SlmAdvParams(min_len=12, max_len=24, sig=1.5),
    )
