"""Activation functions."""

from __future__ import annotations

import math

import jax.numpy as jnp


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * negative_slope)


# cos(2*pi*r) for r in [-0.5, 0.5] as an even minimax polynomial in r^2 —
# max error 5.8e-7 in f32 Horner, i.e. f32-exact for bf16-grade activations
_COS2PI = (0.9999999922907769, -19.739205554196992, 64.93917224101199,
           -85.45116596154068, 60.176231846647745, -26.000534013376054,
           6.575620918395225)


def _cos2pi(r: jnp.ndarray) -> jnp.ndarray:
    """cos(2*pi*r) via round-based range reduction + degree-6 polynomial."""
    r = r - jnp.round(r)
    s = r * r
    acc = jnp.float32(_COS2PI[-1])
    for c in _COS2PI[-2::-1]:
        acc = acc * s + jnp.float32(c)
    return acc


def sin2pi(r: jnp.ndarray) -> jnp.ndarray:
    """sin(2*pi*r) for phase expressed in turns, via the cos polynomial.

    ``sin(2*pi*r) = cos(2*pi*(r - 1/4))``.  Same motivation as ``snake``:
    XLA's ``sin`` pays a Payne-Hanek range reduction (~9x an HBM pass on the
    VPU).  Accuracy: the polynomial itself agrees with exact sin to ~6e-7
    on the reduced range |r| <= 1/2; for large turns counters the error is
    input-quantization-limited at ~|r|*eps (measured 6.2e-5 at |r| <= 200 —
    the f32 ulp of the accumulator dominates, exactly as it does for the
    reference's f32 radians accumulator).  For monotone phase accumulators
    this form is still *more* accurate than feeding radians to ``sin``: the
    turns value is reduced before the 2*pi multiply ever happens, so there
    is no additional ``r*2pi`` rounding term.
    """
    rf = r.astype(jnp.float32)
    return _cos2pi(rf - jnp.float32(0.25)).astype(r.dtype)


def sin_poly(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x) for radians input via the range-reduced cos polynomial."""
    xf = x.astype(jnp.float32)
    return _cos2pi(
        xf * jnp.float32(0.5 / math.pi) - jnp.float32(0.25)).astype(x.dtype)


def cos_poly(x: jnp.ndarray) -> jnp.ndarray:
    """cos(x) for radians input via the range-reduced cos polynomial."""
    xf = x.astype(jnp.float32)
    return _cos2pi(xf * jnp.float32(0.5 / math.pi)).astype(x.dtype)


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake1D: ``x + (1/alpha) * sin(alpha*x)^2`` (ref: Modules/istftnet.py:69).

    ``alpha`` broadcasts over (B, C, T); the reference stores it as (1, C, 1).

    Computed as ``x + (1 - cos(2*alpha*x)) / (2*alpha)``, with the cosine as
    a cheap range-reduced polynomial: XLA's ``sin`` lowers to a full
    Payne-Hanek range reduction that costs ~9x an HBM pass on the VPU
    (measured 6.9 ms vs 0.75 ms for one elementwise pass at B=16, C=128,
    T=48000) — and the vocoder evaluates snake 6x per resblock.  The
    polynomial agrees with the exact form to ~6e-7.
    """
    xf = x.astype(jnp.float32)
    af = alpha.astype(jnp.float32)
    y = xf + (1.0 - _cos2pi(af * xf * jnp.float32(1.0 / math.pi))) / (2.0 * af)
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch.nn.GELU default."""
    import jax
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximate GELU (HF transformers 'gelu_new')."""
    import jax
    return jax.nn.gelu(x, approximate=True)
