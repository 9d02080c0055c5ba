"""Activation functions."""

from __future__ import annotations

import jax.numpy as jnp


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake1D: ``x + (1/alpha) * sin(alpha*x)^2`` (ref: Modules/istftnet.py:69).

    ``alpha`` broadcasts over (B, C, T); the reference stores it as (1, C, 1).
    """
    return x + (1.0 / alpha) * jnp.square(jnp.sin(alpha * x))


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch.nn.GELU default."""
    import jax
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximate GELU (HF transformers 'gelu_new')."""
    import jax
    return jax.nn.gelu(x, approximate=True)
