"""Mel -> style vector encoders (ref: models.py:150-227).

A Conv2d stem, four spectral-norm ResBlks with stride-2 downsampling, a 5x5
valid conv, global average pooling and a linear head.  Instantiated twice in
the zoo: ``style_encoder`` (acoustic) and ``predictor_encoder`` (prosodic).

The reference can only run this per-sample because of the unmasked
AdaptiveAvgPool2d (ref: train_second.py:577-587 loops batch-of-1 calls).
Here the pool is optionally *masked* over valid frames so whole padded
batches run in one call; with uniform lengths the result is identical to the
reference's per-sample loop.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.conv import avg_pool2d
from ..nn.linear import linear
from . import common as cm


def init_resblk(key, dim_in: int, dim_out: int, downsample: bool = True) -> Dict:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": cm.init_sn_conv(ks[0], dim_in, dim_in, (3, 3)),
        "conv2": cm.init_sn_conv(ks[1], dim_in, dim_out, (3, 3)),
    }
    if downsample:
        p["downsample_res"] = {"conv": cm.init_sn_conv(ks[2], dim_in, dim_in, (3, 3), groups=dim_in)}
    if dim_in != dim_out:
        p["conv1x1"] = cm.init_sn_conv(ks[3], dim_in, dim_out, (1, 1), bias=False)
    return p


def _downsample_half(x: jnp.ndarray) -> jnp.ndarray:
    """DownSample('half'): replicate-pad odd spatial dims, then 2x2 avg pool
    (ref: models.py:110-128)."""
    if x.shape[-1] % 2 != 0:
        x = jnp.concatenate([x, x[..., -1:]], axis=-1)
    if x.shape[-2] % 2 != 0:
        x = jnp.concatenate([x, x[..., -1:, :]], axis=-2)
    return avg_pool2d(x, 2)


def resblk_apply(p: Dict, x: jnp.ndarray, downsample: bool = True) -> jnp.ndarray:
    # shortcut
    sc = x
    if "conv1x1" in p:
        sc = cm.sn_conv2d(p["conv1x1"], sc)
    if downsample:
        sc = _downsample_half(sc)
    # residual
    h = cm.leaky_relu(x, 0.2)
    h = cm.sn_conv2d(p["conv1"], h, padding=1)
    if downsample:
        h = cm.sn_conv2d(p["downsample_res"]["conv"], h, stride=2, padding=1,
                         groups=h.shape[1])
    h = cm.leaky_relu(h, 0.2)
    h = cm.sn_conv2d(p["conv2"], h, padding=1)
    return (sc + h) / math.sqrt(2.0)


def init_discriminator2d(key, dim_in: int = 48, num_domains: int = 1,
                         max_conv_dim: int = 384, repeat_num: int = 4) -> Dict:
    """The unused spare 2-D discriminator kept for checkpoint compatibility
    (ref: models.py:243-273)."""
    ks = jax.random.split(key, repeat_num + 3)
    main: Dict = {"0": cm.init_sn_conv(ks[0], 1, dim_in, (3, 3))}
    d = dim_in
    for i in range(repeat_num):
        d_out = min(d * 2, max_conv_dim)
        main[str(i + 1)] = init_resblk(ks[i + 1], d, d_out)
        d = d_out
    main["6"] = cm.init_sn_conv(ks[-2], d, d, (5, 5))
    main["9"] = cm.init_sn_conv(ks[-1], d, num_domains, (1, 1))
    return {"main": main}


def discriminator2d_apply(params: Dict, x: jnp.ndarray,
                          repeat_num: int = 4) -> jnp.ndarray:
    """Returns (B, num_domains) scores (ref: models.py:261-273)."""
    main = params["main"]
    h = cm.sn_conv2d(main["0"], x, padding=1)
    for i in range(repeat_num):
        h = resblk_apply(main[str(i + 1)], h)
    h = cm.leaky_relu(h, 0.2)
    h = cm.sn_conv2d(main["6"], h)
    h = cm.leaky_relu(h, 0.2)
    h = h.mean(axis=(2, 3), keepdims=True)
    h = cm.sn_conv2d(main["9"], h)
    return h.reshape(h.shape[0], -1)


def init_style_encoder(key, dim_in: int = 64, style_dim: int = 128,
                       max_conv_dim: int = 512, repeat_num: int = 4) -> Dict:
    ks = jax.random.split(key, repeat_num + 3)
    shared: Dict = {"0": cm.init_sn_conv(ks[0], 1, dim_in, (3, 3))}
    d = dim_in
    for i in range(repeat_num):
        d_out = min(d * 2, max_conv_dim)
        shared[str(i + 1)] = init_resblk(ks[i + 1], d, d_out)
        d = d_out
    shared["6"] = cm.init_sn_conv(ks[-2], d, d, (5, 5))
    return {
        "shared": shared,
        "unshared": cm.init_linear(ks[-1], d, style_dim),
    }


def style_encoder_apply(
    params: Dict,
    mel: jnp.ndarray,                       # (B, 1, n_mels, T) normalized log-mel
    lengths: Optional[jnp.ndarray] = None,  # (B,) valid frame counts
    repeat_num: int = 4,
) -> jnp.ndarray:
    """Returns style vectors (B, style_dim)."""
    # The 4x stride-2 stack + 5x5 valid conv needs >= 80 input frames
    # (the reference skips shorter clips, ref: train_first.py:378-379).
    if mel.shape[-1] < 5 * (2 ** repeat_num) or mel.shape[-2] < 5 * (2 ** repeat_num):
        raise ValueError(
            f"style encoder input {mel.shape} too small: needs >= "
            f"{5 * (2 ** repeat_num)} mel bins and frames")
    shared = params["shared"]
    mel = cm.autocast(params, mel)
    x = cm.sn_conv2d(shared["0"], mel, padding=1)
    for i in range(repeat_num):
        x = resblk_apply(shared[str(i + 1)], x)
    x = cm.leaky_relu(x, 0.2)
    x = cm.sn_conv2d(shared["6"], x)        # valid 5x5 conv
    # Global average pool, masked over valid frames when lengths are known.
    if lengths is None:
        h = x.mean(axis=(2, 3))
    else:
        t_down = lengths
        for _ in range(repeat_num):
            t_down = (t_down + 1) // 2      # ceil halving per downsample block
        t_down = jnp.maximum(t_down - 4, 1)  # 5x5 valid conv trims 4 frames
        t = x.shape[-1]
        keep = (jnp.arange(t)[None, :] < t_down[:, None])[:, None, None, :]
        h = (x * keep).sum(axis=(2, 3)) / (x.shape[2] * t_down[:, None])
    h = cm.leaky_relu(h, 0.2)
    return linear(h, params["unshared"]["weight"], params["unshared"]["bias"])
