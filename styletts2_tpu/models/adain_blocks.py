"""Style-conditioned 1-D residual blocks (ref: models.py:440-547,
Modules/istftnet.py:409-464 — identical math in both).

``AdainResBlk1d``: 2 x (AdaIN -> LeakyReLU(0.2) -> weight-norm conv) residual
with optional 2x upsampling (nearest-neighbour on the shortcut, grouped
stride-2 transpose conv "pool" on the residual) and 1/sqrt(2) scaling.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.conv import conv_transpose1d, interpolate_nearest_2x
from ..nn.norm import adain1d
from ..nn.param_norm import weight_norm_kernel
from . import common as cm


def init_adain_resblk1d(key, dim_in: int, dim_out: int, style_dim: int,
                        upsample: bool = False) -> Dict:
    ks = jax.random.split(key, 6)
    p = {
        "conv1": cm.init_wn_conv(ks[0], dim_in, dim_out, 3),
        "conv2": cm.init_wn_conv(ks[1], dim_out, dim_out, 3),
        "norm1": {"fc": cm.init_linear(ks[2], style_dim, dim_in * 2)},
        "norm2": {"fc": cm.init_linear(ks[3], style_dim, dim_out * 2)},
    }
    if dim_in != dim_out:
        p["conv1x1"] = cm.init_wn_conv(ks[4], dim_in, dim_out, 1, bias=False)
    if upsample:
        p["pool"] = cm.init_wn_conv_transpose(ks[5], dim_in, dim_in, 3, groups=dim_in)
    return p


def adain_resblk1d_apply(
    p: Dict,
    x: jnp.ndarray,                 # (B, C_in, T)
    s: jnp.ndarray,                 # (B, style_dim)
    upsample: bool = False,
    dropout_p: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid frames at input rate
) -> jnp.ndarray:
    # Masked padded batches must reproduce the reference's exact-length
    # computation: adain1d(keep=...) restricts the NORM STATS to valid
    # frames, but its output at pad positions is nonzero (beta etc.), and
    # the kernel-3 convs would leak those into the last valid frames where
    # the exact-length reference sees zero conv padding — so pad positions
    # are re-zeroed after every non-conv stage.
    keep = keep_out = None
    if lengths is not None:
        keep = (jnp.arange(x.shape[-1])[None, :] < lengths[:, None])[:, None, :]
        keep = keep.astype(x.dtype)
        keep_out = keep
        x = x * keep
    # shortcut
    sc = interpolate_nearest_2x(x) if upsample else x
    if "conv1x1" in p:
        sc = cm.wn_conv1d(p["conv1x1"], sc)
    # residual
    h = adain1d(p["norm1"], x, s, keep=None if keep is None else keep[:, 0, :])
    h = cm.leaky_relu(h, 0.2)
    if keep is not None:
        h = h * keep
    if upsample:
        h = conv_transpose1d(
            h, weight_norm_kernel(p["pool"]), p["pool"].get("bias"),
            stride=2, padding=1, output_padding=1, groups=h.shape[1],
        )
        if lengths is not None:
            keep_out = (jnp.arange(h.shape[-1])[None, :] <
                        (lengths * 2)[:, None])[:, None, :].astype(h.dtype)
            h = h * keep_out
    if train and rng is not None:
        h = cm.dropout(h, dropout_p, train, jax.random.fold_in(rng, 1))
    h = cm.wn_conv1d(p["conv1"], h, padding=1)
    h = adain1d(p["norm2"], h, s,
                keep=None if keep_out is None else keep_out[:, 0, :])
    h = cm.leaky_relu(h, 0.2)
    if keep_out is not None:
        h = h * keep_out
    if train and rng is not None:
        h = cm.dropout(h, dropout_p, train, jax.random.fold_in(rng, 2))
    h = cm.wn_conv1d(p["conv2"], h, padding=1)
    out = (h + sc) / math.sqrt(2.0)
    return out if keep_out is None else out * keep_out
