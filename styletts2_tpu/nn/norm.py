"""Normalization layers (channels-first) and the AdaIN family.

Numerics match the torch modules the reference composes:
- InstanceNorm1d/2d with ``affine=False, track_running_stats=False`` (biased
  variance, eps 1e-5)
- LayerNorm over the channel axis of channels-first data (the reference's
  custom ``LayerNorm`` transposes, ref: models.py:348-360)
- AdaIN1d: ``(1 + gamma) * instance_norm(x) + beta`` with (gamma, beta) from a
  style projection (ref: models.py:440-450)
- AdaLayerNorm: parameter-free layer norm modulated by style
  (ref: models.py:528-547, Modules/diffusion/modules.py:18-38)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .linear import linear


def layer_norm(x: jnp.ndarray, gamma=None, beta=None, eps: float = 1e-5,
               axis: int = -1) -> jnp.ndarray:
    """LayerNorm over one axis (weight/bias broadcast along that axis).

    Statistics are accumulated in float32 (a bf16 mean/var over long axes
    loses too many bits); the normalized result returns in the input dtype.
    """
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=axis, keepdims=True)
    var = xf.var(axis=axis, keepdims=True)
    y = ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)
    if gamma is not None:
        shape = [1] * x.ndim
        shape[axis] = x.shape[axis]
        y = y * gamma.reshape(shape)
        if beta is not None:
            y = y + beta.reshape(shape)
    return y


def layer_norm_channels(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                        eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm across channels of (B, C, T) data (ref custom LayerNorm)."""
    return layer_norm(x, gamma, beta, eps=eps, axis=1)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  gamma=None, beta=None) -> jnp.ndarray:
    """InstanceNorm over all spatial axes of (B, C, *spatial)."""
    axes = tuple(range(2, x.ndim))
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=axes, keepdims=True)
    var = xf.var(axis=axes, keepdims=True)
    y = ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)
    if gamma is not None:
        shape = (1, x.shape[1]) + (1,) * (x.ndim - 2)
        y = y * gamma.reshape(shape) + beta.reshape(shape)
    return y


def masked_instance_norm1d(x: jnp.ndarray, keep: jnp.ndarray,
                           eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm over valid frames only: ``keep`` (B, T) marks validity.

    With padded batches, unmasked statistics are contaminated by the zero
    region and batched synthesis stops matching exact-length synthesis.
    """
    xf = x.astype(jnp.float32)
    k = keep[:, None, :].astype(jnp.float32)
    n = jnp.maximum(k.sum(axis=2, keepdims=True), 1.0)
    mean = (xf * k).sum(axis=2, keepdims=True) / n
    var = (jnp.square(xf - mean) * k).sum(axis=2, keepdims=True) / n
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def adain1d(params: dict, x: jnp.ndarray, s: jnp.ndarray, eps: float = 1e-5,
            keep=None) -> jnp.ndarray:
    """Adaptive instance norm on (B, C, T) conditioned on style (B, S).

    ``params['fc']`` holds a torch Linear (weight (2C, S), bias (2C,)); the
    first C outputs are gamma, the rest beta.  ``keep`` (B, T) restricts the
    normalization statistics to valid frames (padded batched synthesis).
    """
    h = linear(s, params["fc"]["weight"], params["fc"]["bias"])  # (B, 2C)
    gamma, beta = jnp.split(h, 2, axis=-1)
    norm = instance_norm(x, eps) if keep is None else masked_instance_norm1d(x, keep, eps)
    return (1.0 + gamma[:, :, None]) * norm + beta[:, :, None]


def ada_layer_norm(params: dict, x: jnp.ndarray, s: jnp.ndarray,
                   eps: float = 1e-5, channels_first: bool = False) -> jnp.ndarray:
    """Style-conditioned LayerNorm.

    ``x`` is (B, T, C) by default (the layout both reference AdaLayerNorms
    normalize in); set ``channels_first`` for (B, C, T) inputs/outputs.
    """
    if channels_first:
        x = jnp.swapaxes(x, -1, -2)
    h = linear(s, params["fc"]["weight"], params["fc"]["bias"])  # (B, 2C)
    gamma, beta = jnp.split(h, 2, axis=-1)
    y = layer_norm(x, eps=eps, axis=-1)
    y = (1.0 + gamma[:, None, :]) * y + beta[:, None, :]
    if channels_first:
        y = jnp.swapaxes(y, -1, -2)
    return y
