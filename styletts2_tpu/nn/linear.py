"""Linear layer matching torch layout: w (out, in), y = x @ w.T + b."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    y = x @ w.T
    if b is not None:
        y = y + b
    return y
