"""Parameter initializers reproducing torch defaults.

Matching init *distributions* (not streams) keeps from-scratch training
dynamics comparable with the reference.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _fan_in_out(shape: Sequence[int]) -> Tuple[int, int]:
    """Fan-in/out for a torch-layout weight (out, in, *kernel) or (out, in)."""
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def kaiming_uniform(key, shape, a: float = math.sqrt(5.0), dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ on a torch-layout weight."""
    fan_in, _ = _fan_in_out(shape)
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias(key, shape, weight_shape, dtype=jnp.float32):
    """torch Conv/Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in, _ = _fan_in_out(weight_shape)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = _fan_in_out(shape)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_sqrt_hidden(key, shape, hidden_size: int, dtype=jnp.float32):
    """torch LSTM default: U(-1/sqrt(H), 1/sqrt(H)) for every parameter."""
    bound = 1.0 / math.sqrt(hidden_size)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal(key, shape, std: float = 1.0, mean: float = 0.0, dtype=jnp.float32):
    return mean + std * jax.random.normal(key, shape, dtype)


def hifigan_conv(key, shape, dtype=jnp.float32):
    """HiFi-GAN ``init_weights``: N(0, 0.01) (ref: Modules/utils.py style)."""
    return normal(key, shape, std=0.01, dtype=dtype)
