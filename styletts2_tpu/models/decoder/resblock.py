"""AdaINResBlock1 — the Snake-activated MRF residual block shared by both
vocoders (ref: Modules/istftnet.py:27-81, Modules/hifigan.py:26-80).

Three rounds of [AdaIN -> Snake -> dilated conv -> AdaIN -> Snake -> conv],
each with per-channel learnable Snake alphas, accumulated residually.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

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
        h = cm.wn_conv1d(p["convs1"][str(i)], h,
                         padding=_get_padding(kernel_size, dilation[i]),
                         dilation=dilation[i])
        h = adain_snake(p["adain2"][str(i)], h, s, p["alpha2"][str(i)],
                        lengths=lengths)
        h = cm.wn_conv1d(p["convs2"][str(i)], h,
                         padding=_get_padding(kernel_size, 1))
        x = x + h
    return x
