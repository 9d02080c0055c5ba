"""AdaINResBlock1 — the Snake-activated MRF residual block shared by both
vocoders (ref: Modules/istftnet.py:27-81, Modules/hifigan.py:26-80).

Three rounds of [AdaIN -> Snake -> dilated conv -> AdaIN -> Snake -> conv],
each with per-channel learnable Snake alphas, accumulated residually.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ...nn.conv import conv1d, conv1d_folded, mxu_conv_forms
from ...nn.param_norm import weight_norm_kernel
from ...ops.fused import adain_snake
from .. import common as cm


def _get_padding(kernel: int, dilation: int) -> int:
    return (kernel * dilation - dilation) // 2


def init_adain_resblock1(key, channels: int, kernel_size: int = 3,
                         dilation: Sequence[int] = (1, 3, 5),
                         style_dim: int = 64) -> Dict:
    ks = jax.random.split(key, 12)
    p: Dict = {"convs1": {}, "convs2": {}, "adain1": {}, "adain2": {},
               "alpha1": {}, "alpha2": {}}
    for i in range(3):
        p["convs1"][str(i)] = cm.init_wn_conv(
            ks[i], channels, channels, kernel_size, w_init=cm.jinit_hifigan)
        p["convs2"][str(i)] = cm.init_wn_conv(
            ks[3 + i], channels, channels, kernel_size, w_init=cm.jinit_hifigan)
        p["adain1"][str(i)] = {"fc": cm.init_linear(ks[6 + i], style_dim, channels * 2)}
        p["adain2"][str(i)] = {"fc": cm.init_linear(ks[9 + i], style_dim, channels * 2)}
        p["alpha1"][str(i)] = jnp.ones((1, channels, 1))
        p["alpha2"][str(i)] = jnp.ones((1, channels, 1))
    return p


def adain_resblock1_fused(p: Dict, x_pad: jnp.ndarray, s: jnp.ndarray,
                          kernel_size: int, dilation: Sequence[int],
                          lengths: jnp.ndarray, t: int, t_blk: int,
                          stats=None, interpret: bool = False,
                          conv_mode: str = "taps"):
    """Fused-kernel resblock on a guarded channels-last buffer.

    Same math as ``adain_resblock1_apply`` but each of the 6
    AdaIN->Snake->conv rounds is ONE Pallas pass
    (ops/pallas/mrf_round_kernel.py) and the instance-norm statistics chain
    through the kernel's emitted partials — only the caller-supplied
    ``stats`` of the input (shared across a stage's resblocks) ever costs a
    separate reduction.  Inference-only (no custom VJP).

    Returns ``(out_pad, (mean, rstd) of out)``.
    """
    from ...nn.linear import linear
    from ...ops.pallas.mrf_round_kernel import (
        fused_mrf_round, masked_stats_guarded, pack_plane, stats_from_partials)
    from ...nn.param_norm import weight_norm_kernel

    if stats is None:
        stats = masked_stats_guarded(x_pad, lengths, t_blk, t)
    mean, rstd = stats
    for i in range(3):
        si = str(i)
        w1 = jnp.transpose(weight_norm_kernel(p["convs1"][si]), (2, 1, 0))
        w2 = jnp.transpose(weight_norm_kernel(p["convs2"][si]), (2, 1, 0))
        a1 = linear(s, p["adain1"][si]["fc"]["weight"],
                    p["adain1"][si]["fc"]["bias"])
        g1, b1 = jnp.split(a1, 2, axis=-1)
        a2 = linear(s, p["adain2"][si]["fc"]["weight"],
                    p["adain2"][si]["fc"]["bias"])
        g2, b2 = jnp.split(a2, 2, axis=-1)
        h_pad, parts = fused_mrf_round(
            x_pad,
            pack_plane(mean, rstd, g1, b1, p["alpha1"][si].reshape(-1),
                       p["convs1"][si]["bias"]),
            w1, lengths, k=kernel_size, d=int(dilation[i]), t_blk=t_blk, t=t,
            emit_stats=True, interpret=interpret, conv_mode=conv_mode)
        mh, rh = stats_from_partials(parts, lengths, t)
        x_pad, parts2 = fused_mrf_round(
            h_pad,
            pack_plane(mh, rh, g2, b2, p["alpha2"][si].reshape(-1),
                       p["convs2"][si]["bias"]),
            w2, lengths, k=kernel_size, d=1, t_blk=t_blk, t=t,
            residual=x_pad, emit_stats=True, interpret=interpret,
            conv_mode=conv_mode)
        mean, rstd = stats_from_partials(parts2, lengths, t)
    return x_pad, (mean, rstd)


def _mrf_conv(p: Dict, x: jnp.ndarray, kernel_size: int,
              dilation: int) -> jnp.ndarray:
    """Weight-normed 'same' MRF conv; small-channel towers fold time into
    channels (conv1d_folded) so HiFi-GAN's C=32/64 stages feed the
    128-lane MXU instead of running at 5-18% MFU.  TPU-only: the extra
    paper FLOPs are a loss on CPU meshes (nn/conv.py::mxu_conv_forms)."""
    c = x.shape[1]
    if c < 128 and 128 % c == 0 and mxu_conv_forms():
        return conv1d_folded(x, weight_norm_kernel(p), p.get("bias"),
                             dilation=dilation, fold=128 // c)
    return conv1d(x, weight_norm_kernel(p), p.get("bias"),
                  padding=_get_padding(kernel_size, dilation),
                  dilation=dilation)


def adain_resblock1_apply(p: Dict, x: jnp.ndarray, s: jnp.ndarray,
                          kernel_size: int = 3,
                          dilation: Sequence[int] = (1, 3, 5),
                          lengths=None) -> jnp.ndarray:
    """Each AdaIN -> Snake pair goes through ops/fused.py::adain_snake —
    one call site for the XLA composition and the optional fused Pallas
    kernel (measured a wash at production shapes; see ops/fused.py)."""
    for i in range(3):
        h = adain_snake(p["adain1"][str(i)], x, s, p["alpha1"][str(i)],
                        lengths=lengths)
        h = _mrf_conv(p["convs1"][str(i)], h, kernel_size, dilation[i])
        h = adain_snake(p["adain2"][str(i)], h, s, p["alpha2"][str(i)],
                        lengths=lengths)
        h = _mrf_conv(p["convs2"][str(i)], h, kernel_size, 1)
        x = x + h
    return x
