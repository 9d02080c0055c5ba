"""HiFi-GAN decoder — the LibriTTS/multispeaker vocoder
(ref: Modules/hifigan.py:271-474).

Shares the AdainResBlk1d encode/decode head and harmonic source with the
iSTFTNet decoder; the generator instead upsamples all the way to the
waveform with four transposed-conv stages, per-stage Snake alphas, raw
harmonic-source injection (no STFT), and a tanh output.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...config import DecoderConfig
from ...nn.conv import (conv1d, conv_transpose1d, conv_transpose1d_subpixel,
                        mxu_conv_forms)
from ...nn.activations import snake
from ...nn.param_norm import weight_norm_kernel
from .. import common as cm
from ..adain_blocks import adain_resblk1d_apply, init_adain_resblk1d
from .resblock import (adain_resblock1_apply, init_adain_resblock1,
                       mrf_branch_scan_enabled, mrf_branches_scan)
from .source import init_source_module, source_module_apply_mel
from .istftnet import random_smooth


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


def init_generator(key, cfg: DecoderConfig, style_dim: int = 128) -> Dict:
    rates = cfg.upsample_rates
    kernels = cfg.upsample_kernel_sizes
    init_ch = cfg.upsample_initial_channel
    ks = jax.random.split(key, 64)
    ki = iter(range(64))

    p: Dict = {
        "m_source": init_source_module(ks[next(ki)]),
        "ups": {}, "noise_convs": {}, "noise_res": {}, "resblocks": {},
        "alphas": {"0": jnp.ones((1, init_ch, 1))},
    }
    for i, (u, k) in enumerate(zip(rates, kernels)):
        c_cur = init_ch // (2 ** (i + 1))
        p["ups"][str(i)] = cm.init_wn_conv_transpose(
            ks[next(ki)], init_ch // (2 ** i), c_cur, k)
        if i + 1 < len(rates):
            stride_f0 = _prod(rates[i + 1:])
            p["noise_convs"][str(i)] = cm.init_conv(ks[next(ki)], 1, c_cur, stride_f0 * 2)
            p["noise_res"][str(i)] = init_adain_resblock1(ks[next(ki)], c_cur, 7, (1, 3, 5), style_dim)
        else:
            p["noise_convs"][str(i)] = cm.init_conv(ks[next(ki)], 1, c_cur, 1)
            p["noise_res"][str(i)] = init_adain_resblock1(ks[next(ki)], c_cur, 11, (1, 3, 5), style_dim)
        p["alphas"][str(i + 1)] = jnp.ones((1, c_cur, 1))
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            p["resblocks"][str(i * len(cfg.resblock_kernel_sizes) + j)] = \
                init_adain_resblock1(ks[next(ki)], c_cur, rk, rd, style_dim)
    ch = init_ch // (2 ** len(rates))
    p["conv_post"] = cm.init_wn_conv(ks[next(ki)], ch, 1, 7, w_init=cm.jinit_hifigan)
    return p


def generator_apply(
    params: Dict,
    cfg: DecoderConfig,
    x: jnp.ndarray,            # (B, init_ch, T_mel)
    s: jnp.ndarray,            # (B, style_dim)
    f0: jnp.ndarray,           # (B, T_mel)
    key: Optional[jax.Array] = None,
    deterministic: bool = True,
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid frames at T_mel rate
    fused: bool = False,
    branch_scan: bool = False,
) -> jnp.ndarray:
    """Returns waveform (B, 1, T_samples) (ref: Modules/hifigan.py:320-346).

    ``fused=True``: MRF resblocks through the fused Pallas round kernel
    (see istftnet.generator_apply) — inference only.  ``branch_scan=True``:
    MRF branches as one lax.scan (training-compile form, exact — see
    resblock.mrf_branches_scan)."""
    from ...ops.fused import resolve_mrf_round
    from .istftnet import _mrf_stage_fused, _noise_res_fused
    impl = resolve_mrf_round() if fused else None
    rates = cfg.upsample_rates
    num_kernels = len(cfg.resblock_kernel_sizes)
    upsample_scale = _prod(rates)

    # mel-rate source entry point: skips the repeat-then-decimate round trip
    # of the reference (exact — see source.py::_sine_gen_mel_cf)
    har_source, _, _ = source_module_apply_mel(
        params["m_source"], key, f0, upsample_scale, deterministic=deterministic)
    # the source's phase integration is fp32-pinned; rejoin the surrounding
    # compute dtype so a bf16 step isn't promoted to fp32 at the noise convs
    har = jnp.swapaxes(har_source, 1, 2).astype(x.dtype)      # (B, 1, T_audio)

    for i in range(len(rates)):
        x = snake(x, params["alphas"][str(i)])
        nc = params["noise_convs"][str(i)]
        if i + 1 < len(rates):
            stride_f0 = _prod(rates[i + 1:])
            x_source = conv1d(har, nc["weight"], nc["bias"], stride=stride_f0,
                              padding=(stride_f0 + 1) // 2)
            nres_k = 7
        else:
            x_source = conv1d(har, nc["weight"], nc["bias"])
            nres_k = 11
        stage_lengths = None
        if lengths is not None:
            mult = 1
            for r_ in rates[: i + 1]:
                mult *= r_
            stage_lengths = lengths * mult
        if impl is not None:
            x_source = _noise_res_fused(params["noise_res"][str(i)], x_source,
                                        s, nres_k, stage_lengths, impl)
        else:
            x_source = adain_resblock1_apply(params["noise_res"][str(i)],
                                             x_source, s, nres_k, (1, 3, 5),
                                             lengths=stage_lengths)
        up = params["ups"][str(i)]
        u, k = rates[i], cfg.upsample_kernel_sizes[i]
        up_fn = (conv_transpose1d_subpixel if k == 2 * u and mxu_conv_forms()
                 else conv_transpose1d)
        x = up_fn(x, weight_norm_kernel(up), up.get("bias"),
                  stride=u, padding=u // 2 + u % 2, output_padding=u % 2)
        x_source = x_source[..., : x.shape[-1]]
        if x_source.shape[-1] < x.shape[-1]:
            x_source = jnp.pad(x_source, ((0, 0), (0, 0), (0, x.shape[-1] - x_source.shape[-1])))
        x = x + x_source
        if impl is not None:
            x = _mrf_stage_fused(params, cfg, x, s, i, stage_lengths, impl)
        elif (branch_scan and mrf_branch_scan_enabled()
                and len(set(cfg.resblock_dilation_sizes)) == 1):
            blocks = [params["resblocks"][str(i * num_kernels + j)]
                      for j in range(num_kernels)]
            x = mrf_branches_scan(blocks, x, s, cfg.resblock_kernel_sizes,
                                  cfg.resblock_dilation_sizes[0],
                                  lengths=stage_lengths)
        else:
            xs = None
            for j in range(num_kernels):
                r = adain_resblock1_apply(
                    params["resblocks"][str(i * num_kernels + j)], x, s,
                    cfg.resblock_kernel_sizes[j],
                    cfg.resblock_dilation_sizes[j], lengths=stage_lengths)
                xs = r if xs is None else xs + r
            x = xs / num_kernels

    x = snake(x, params["alphas"][str(len(rates))])
    x = cm.wn_conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)


def init_decoder(key, cfg: DecoderConfig, dim_in: int = 512, style_dim: int = 128,
                 width: int = 1024, asr_res_ch: int = 64) -> Dict:
    """``width``/``asr_res_ch`` default to the reference's hard-coded 1024/64
    channel plan (ref: Decoder.__init__); smaller values are for tests."""
    ks = jax.random.split(key, 10)
    return {
        "encode": init_adain_resblk1d(ks[0], dim_in + 2, width, style_dim),
        "decode": {
            "0": init_adain_resblk1d(ks[1], width + 2 + asr_res_ch, width, style_dim),
            "1": init_adain_resblk1d(ks[2], width + 2 + asr_res_ch, width, style_dim),
            "2": init_adain_resblk1d(ks[3], width + 2 + asr_res_ch, width, style_dim),
            "3": init_adain_resblk1d(ks[4], width + 2 + asr_res_ch, width // 2, style_dim, upsample=True),
        },
        "F0_conv": cm.init_wn_conv(ks[5], 1, 1, 3),
        "N_conv": cm.init_wn_conv(ks[6], 1, 1, 3),
        "asr_res": {"0": cm.init_wn_conv(ks[7], dim_in, asr_res_ch, 1)},
        "generator": init_generator(ks[8], cfg, style_dim),
    }


def decoder_apply(
    params: Dict,
    cfg: DecoderConfig,
    asr: jnp.ndarray,
    f0_curve: jnp.ndarray,
    n_curve: jnp.ndarray,
    s: jnp.ndarray,
    key: Optional[jax.Array] = None,
    train: bool = False,
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid T_en frames
    fused: bool = False,
) -> jnp.ndarray:
    """Full HiFi-GAN decoder forward (ref: Modules/hifigan.py:445-474)."""
    asr, f0_curve, n_curve, s = cm.autocast(params, asr, f0_curve, n_curve, s)
    if train and key is not None:
        f0_curve = random_smooth(jax.random.fold_in(key, 11), f0_curve, (0, 3, 7))
        n_curve = random_smooth(jax.random.fold_in(key, 12), n_curve, (0, 3, 7, 15))

    f0 = cm.wn_conv1d(params["F0_conv"], f0_curve[:, None, :], stride=2, padding=1)
    n = cm.wn_conv1d(params["N_conv"], n_curve[:, None, :], stride=2, padding=1)

    x = jnp.concatenate([asr, f0, n], axis=1)
    x = adain_resblk1d_apply(params["encode"], x, s, lengths=lengths)
    asr_res = cm.wn_conv1d(params["asr_res"]["0"], asr)

    res = True
    for i in range(4):
        if res:
            x = jnp.concatenate([x, asr_res, f0, n], axis=1)
        upsample = i == 3
        x = adain_resblk1d_apply(params["decode"][str(i)], x, s, upsample=upsample,
                                 lengths=lengths)
        if upsample:
            res = False

    # Source noise follows the key (see istftnet.decoder_apply): the
    # reference adds SineGen dither at inference too.
    return generator_apply(params["generator"], cfg, x, s, f0_curve,
                           key=key, deterministic=key is None,
                           lengths=None if lengths is None else lengths * 2,
                           fused=fused and not train, branch_scan=train)
