"""Model-zoo assembly — the ``build_model`` equivalent (ref: models.py:1002-1110).

Builds the 13-net parameter collection:
bert, bert_encoder, predictor, decoder, text_encoder, predictor_encoder,
style_encoder, diffusion, text_aligner, pitch_extractor, mpd, msd, wd.

Params are one nested dict keyed by net name; the static structure (configs,
decoder type, multispeaker flag) lives in ``ModelParams``/dataclass configs so
jitted step functions can close over it.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from ..config import ModelParams
from . import common as cm
from .asr import ASRConfig, init_asr
from .decoder import hifigan, istftnet
from .diffusion.denoiser import init_denoiser
from .discriminators import init_mpd, init_msd, init_whisper_discriminator
from .jdc import JDCConfig, init_jdc
from .plbert import PLBertConfig, init_plbert
from .predictor import init_prosody_predictor
from .style_encoder import init_style_encoder
from .text_encoder import init_text_encoder
from .whisper import WhisperConfig, init_whisper_encoder


def build_zoo(
    key,
    mp: ModelParams,
    plbert_cfg: PLBertConfig = PLBertConfig(),
    asr_cfg: Optional[ASRConfig] = None,
    jdc_cfg: JDCConfig = JDCConfig(),
    whisper_cfg: WhisperConfig = WhisperConfig(),
    include_slm: bool = True,
    decoder_width: int = 1024,
    decoder_asr_res_ch: int = 64,
) -> Dict:
    """Random-init the full zoo (checkpoint loading overwrites leaves)."""
    asr_cfg = asr_cfg or ASRConfig(n_token=mp.n_token)
    ks = jax.random.split(key, 14)
    decoder_mod = istftnet if mp.decoder.type == "istftnet" else hifigan
    zoo: Dict = {
        "bert": init_plbert(ks[0], plbert_cfg),
        "bert_encoder": cm.init_linear(ks[1], plbert_cfg.hidden_size, mp.hidden_dim),
        "predictor": init_prosody_predictor(ks[2], mp.style_dim, mp.hidden_dim,
                                            mp.n_layer, mp.max_dur),
        "decoder": decoder_mod.init_decoder(ks[3], mp.decoder, mp.hidden_dim, mp.style_dim,
                                            width=decoder_width,
                                            asr_res_ch=decoder_asr_res_ch),
        "text_encoder": init_text_encoder(ks[4], mp.n_token, mp.hidden_dim,
                                          kernel_size=5, depth=mp.n_layer),
        "predictor_encoder": init_style_encoder(ks[5], mp.dim_in, mp.style_dim, mp.hidden_dim),
        "style_encoder": init_style_encoder(ks[6], mp.dim_in, mp.style_dim, mp.hidden_dim),
        "diffusion": {
            "transformer": init_denoiser(
                ks[7],
                channels=mp.style_dim * 2,
                context_embedding_features=plbert_cfg.hidden_size,
                num_layers=mp.diffusion.transformer.num_layers,
                num_heads=mp.diffusion.transformer.num_heads,
                head_features=mp.diffusion.transformer.head_features,
                multiplier=mp.diffusion.transformer.multiplier,
                embedding_max_length=plbert_cfg.max_position_embeddings,
                style_dim=mp.style_dim * 2 if mp.multispeaker else None,
            ),
        },
        "text_aligner": init_asr(ks[8], asr_cfg),
        "pitch_extractor": init_jdc(ks[9], jdc_cfg),
        "mpd": init_mpd(ks[10]),
        "msd": init_msd(ks[11]),
        "wd": init_whisper_discriminator(ks[12], mp.slm.hidden, mp.slm.nlayers,
                                         mp.slm.initial_channel),
    }
    if include_slm:
        zoo["slm_encoder"] = init_whisper_encoder(ks[13], whisper_cfg)
    return zoo


def zoo_configs(mp: ModelParams,
                plbert_cfg: PLBertConfig = PLBertConfig(),
                asr_cfg: Optional[ASRConfig] = None,
                jdc_cfg: JDCConfig = JDCConfig(),
                whisper_cfg: WhisperConfig = WhisperConfig()) -> Dict:
    return {
        "model": mp,
        "plbert": plbert_cfg,
        "asr": asr_cfg or ASRConfig(n_token=mp.n_token),
        "jdc": jdc_cfg,
        "whisper": whisper_cfg,
    }
