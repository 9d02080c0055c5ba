"""iSTFTNet decoder — the LJSpeech default vocoder
(ref: Modules/istftnet.py:301-527).

``Decoder``: AdainResBlk1d encode/decode stack over concat(aligned text
features, downsampled F0/N curves), then ``Generator``: harmonic source
(SineGen STFT spectrum injected at every scale), two transposed-conv
upsampling stages with Snake MRF resblocks, and a final magnitude/phase
projection inverted with the framed iSTFT.

TPU notes: the whole decoder is one jittable function; the iSTFT uses the
shifted-slice overlap-add (hop 5, n_fft 20) rather than scatter; the
training-time random F0/N smoothing (ref hard-codes ``.to('cuda')``,
Modules/istftnet.py:505-507) is a pure function of an explicit key.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...audio.stft import hann_window, istft_from_mag_phase, stft_mag_phase
from ...nn.activations import sin_poly
from ...config import DecoderConfig
from ...nn.conv import (conv1d, conv_transpose1d, conv_transpose1d_subpixel,
                        mxu_conv_forms)
from ...nn.param_norm import weight_norm_kernel
from .. import common as cm
from ..adain_blocks import adain_resblk1d_apply, init_adain_resblk1d
from .resblock import (adain_resblock1_apply, init_adain_resblock1,
                       mrf_branch_scan_enabled, mrf_branches_scan)
from .source import init_source_module, source_module_apply_mel


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------

def init_generator(key, cfg: DecoderConfig, style_dim: int = 128) -> Dict:
    rates = cfg.upsample_rates
    kernels = cfg.upsample_kernel_sizes
    init_ch = cfg.upsample_initial_channel
    n_fft = cfg.gen_istft_n_fft
    ks = jax.random.split(key, 64)
    ki = iter(range(64))

    p: Dict = {
        "m_source": init_source_module(ks[next(ki)]),
        "ups": {}, "noise_convs": {}, "noise_res": {}, "resblocks": {},
    }
    for i, (u, k) in enumerate(zip(rates, kernels)):
        p["ups"][str(i)] = cm.init_wn_conv_transpose(
            ks[next(ki)], init_ch // (2 ** i), init_ch // (2 ** (i + 1)), k)
        c_cur = init_ch // (2 ** (i + 1))
        if i + 1 < len(rates):
            stride_f0 = _prod(rates[i + 1:])
            p["noise_convs"][str(i)] = cm.init_conv(
                ks[next(ki)], n_fft + 2, c_cur, stride_f0 * 2)
            p["noise_res"][str(i)] = init_adain_resblock1(ks[next(ki)], c_cur, 7, (1, 3, 5), style_dim)
        else:
            p["noise_convs"][str(i)] = cm.init_conv(ks[next(ki)], n_fft + 2, c_cur, 1)
            p["noise_res"][str(i)] = init_adain_resblock1(ks[next(ki)], c_cur, 11, (1, 3, 5), style_dim)
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            p["resblocks"][str(i * len(cfg.resblock_kernel_sizes) + j)] = \
                init_adain_resblock1(ks[next(ki)], c_cur, rk, rd, style_dim)
    ch = init_ch // (2 ** len(rates))
    p["conv_post"] = cm.init_wn_conv(ks[next(ki)], ch, n_fft + 2, 7, w_init=cm.jinit_hifigan)
    return p


def _mrf_stage_fused(params, cfg, x, s, stage: int, stage_lengths, impl: str):
    """All MRF resblocks of one generator stage through the fused Pallas
    round kernel: one guarded channels-last pack, ONE stats reduction shared
    by the stage's resblocks, chained stats inside each resblock, one unpack.
    """
    from ...ops.pallas.mrf_round_kernel import (
        masked_stats_guarded, pack_guarded, pick_t_blk, unpack_guarded)
    from .resblock import adain_resblock1_fused

    num_kernels = len(cfg.resblock_kernel_sizes)
    b, _, t_cur = x.shape
    t_blk = pick_t_blk(t_cur)
    lens = (jnp.full((b,), t_cur, jnp.int32) if stage_lengths is None
            else jnp.minimum(stage_lengths, t_cur).astype(jnp.int32))
    x_pad = pack_guarded(x, t_blk)
    stats = masked_stats_guarded(x_pad, lens, t_blk, t_cur)
    xs_pad = None
    for j in range(num_kernels):
        r_pad, _ = adain_resblock1_fused(
            params["resblocks"][str(stage * num_kernels + j)], x_pad, s,
            cfg.resblock_kernel_sizes[j],
            cfg.resblock_dilation_sizes[j], lens, t_cur, t_blk,
            stats=stats, interpret=impl == "interpret")
        xs_pad = r_pad if xs_pad is None else xs_pad + r_pad
    return unpack_guarded(xs_pad, t_blk, t_cur) / num_kernels


def _noise_res_fused(params, x_source, s, nres_k: int, stage_lengths,
                     impl: str):
    """The source-branch AdainResBlock1 through the fused kernel."""
    from ...ops.pallas.mrf_round_kernel import (
        pack_guarded, pick_t_blk, unpack_guarded)
    from .resblock import adain_resblock1_fused

    b, _, t_cur = x_source.shape
    t_blk = pick_t_blk(t_cur)
    lens = (jnp.full((b,), t_cur, jnp.int32) if stage_lengths is None
            else jnp.minimum(stage_lengths, t_cur).astype(jnp.int32))
    out_pad, _ = adain_resblock1_fused(
        params, pack_guarded(x_source, t_blk), s, nres_k, (1, 3, 5),
        lens, t_cur, t_blk, interpret=impl == "interpret")
    return unpack_guarded(out_pad, t_blk, t_cur)


def generator_apply(
    params: Dict,
    cfg: DecoderConfig,
    x: jnp.ndarray,            # (B, init_ch, T_mel)
    s: jnp.ndarray,            # (B, style_dim)
    f0: jnp.ndarray,           # (B, T_mel) F0 curve at mel rate
    key: Optional[jax.Array] = None,
    deterministic: bool = True,
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid frames at T_mel rate
    fused: bool = False,
    branch_scan: bool = False,
) -> jnp.ndarray:
    """Returns waveform (B, 1, T_samples) (ref: Modules/istftnet.py:349-379).

    ``fused=True`` routes every MRF resblock (noise_res + the per-stage MRF
    stack) through the fused Pallas round kernel when
    ``ops.fused.resolve_mrf_round()`` enables it — inference only (the
    kernel defines no VJP).  ``branch_scan=True`` runs the 3 MRF branches
    as one lax.scan with kernels padded to max-k (exact; 3x less HLO for
    the training step's compile — see resblock.mrf_branches_scan)."""
    from ...ops.fused import resolve_mrf_round
    impl = resolve_mrf_round() if fused else None
    rates = cfg.upsample_rates
    n_fft, hop = cfg.gen_istft_n_fft, cfg.gen_istft_hop_size
    num_kernels = len(cfg.resblock_kernel_sizes)
    upsample_scale = _prod(rates) * hop

    # Harmonic source at audio rate (stop-gradient, like the reference
    # no_grad).  The mel-rate entry point skips the reference's
    # repeat-then-decimate round trip — exact, see _sine_gen_mel_cf.
    har_source, _, _ = source_module_apply_mel(
        params["m_source"], key, f0, upsample_scale, deterministic=deterministic)
    har = jax.lax.stop_gradient(har_source[..., 0])               # (B, T_audio)
    har_spec, har_phase = stft_mag_phase(har, n_fft, hop, n_fft)
    # the source STFT is fp32-pinned; rejoin the surrounding compute dtype so
    # a bf16 step doesn't get promoted back to fp32 at the first noise conv
    har = jnp.concatenate([har_spec, har_phase], axis=1).astype(x.dtype)

    for i in range(len(rates)):
        x = cm.leaky_relu(x, 0.1)
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
        up_fn = (conv_transpose1d_subpixel
                 if (k - u) % 2 == 0 and mxu_conv_forms()
                 else conv_transpose1d)
        x = up_fn(x, weight_norm_kernel(up), up.get("bias"),
                  stride=u, padding=(k - u) // 2)
        if i == len(rates) - 1:
            # reflection_pad (1, 0)
            x = jnp.concatenate([x[..., 1:2], x], axis=-1)
        # align the source branch to the (possibly off-by-one) conv lengths
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

    x = cm.leaky_relu(x, 0.01)
    x = cm.wn_conv1d(params["conv_post"], x, padding=3)
    spec = jnp.exp(x[:, : n_fft // 2 + 1, :])
    phase = sin_poly(x[:, n_fft // 2 + 1:, :])
    wav = istft_from_mag_phase(spec, phase, n_fft, hop, n_fft)
    return wav[:, None, :]


# ---------------------------------------------------------------------------
# Decoder (encode/decode AdainResBlk1d stack + generator)
# ---------------------------------------------------------------------------

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


def random_smooth(key, curve: jnp.ndarray, down_choices: Tuple[int, ...]) -> jnp.ndarray:
    """Training-time random moving-average smoothing of F0/N
    (ref: Modules/istftnet.py:499-507), as a pure function of ``key``."""
    idx = jax.random.randint(key, (), 0, len(down_choices))
    outs = []
    for d in down_choices:
        if d == 0:
            outs.append(curve)
        else:
            kern = jnp.ones((1, 1, d), curve.dtype) / d
            sm = conv1d(curve[:, None, :], kern, padding=d // 2)[:, 0, :]
            outs.append(sm[..., : curve.shape[-1]])
    stacked = jnp.stack(outs)
    return stacked[idx]


def decoder_apply(
    params: Dict,
    cfg: DecoderConfig,
    asr: jnp.ndarray,          # (B, 512, T_en) aligned text features
    f0_curve: jnp.ndarray,     # (B, 2*T_en) F0 at mel rate
    n_curve: jnp.ndarray,      # (B, 2*T_en) energy at mel rate
    s: jnp.ndarray,            # (B, style_dim)
    key: Optional[jax.Array] = None,
    train: bool = False,
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid T_en frames (padded batches)
    fused: bool = False,
) -> jnp.ndarray:
    """Full decoder forward -> waveform (B, 1, T_samples)
    (ref: Modules/istftnet.py:498-527)."""
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

    # Source noise follows the key, not the train flag: the reference's
    # SineGen adds its dither at inference too (Modules/istftnet.py:237-246),
    # so noisy inference (checkpoint parity) just needs a key; the engine's
    # deterministic mode passes key=None.
    return generator_apply(params["generator"], cfg, x, s, f0_curve,
                           key=key, deterministic=key is None,
                           lengths=None if lengths is None else lengths * 2,
                           fused=fused and not train, branch_scan=train)
