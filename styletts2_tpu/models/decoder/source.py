"""Harmonic-plus-noise source module (ref: Modules/istftnet.py:111-296,
Modules/hifigan.py:82-267 — same math, different ``upsample_scale``).

``SineGen`` converts an upsampled F0 curve into phase-coherent harmonics via
the reference's interpolate -> cumsum -> interpolate trick: per-sample
instantaneous frequency is decimated by ``upsample_scale``, integrated at the
low rate (keeping the cumsum short and numerically safe), then the phase is
linearly re-interpolated to audio rate.  ``SourceModuleHnNSF`` merges the
harmonics through a tanh(linear) projection.

Randomness (harmonic initial phase, additive noise) takes an explicit key;
pass ``deterministic=True`` to zero it (useful for parity tests).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...nn.conv import interpolate_linear
from ...nn.linear import linear
from .. import common as cm


def init_source_module(key, harmonic_num: int = 8) -> Dict:
    return {"l_linear": cm.init_linear(key, harmonic_num + 1, 1)}


def sine_gen(
    key: Optional[jax.Array],
    f0: jnp.ndarray,                 # (B, T_audio, 1) upsampled F0, 0 when unvoiced
    upsample_scale: int,
    sampling_rate: int = 24000,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 10.0,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (sine_waves, uv, noise), each (B, T_audio, harmonic_num+1[|1])."""
    # Phase integration must run in float32: a bf16 cumsum over tens of
    # thousands of samples destroys pitch accuracy.
    f0 = f0.astype(jnp.float32)
    b, t, _ = f0.shape
    dim = harmonic_num + 1
    harmonics = jnp.arange(1, dim + 1, dtype=f0.dtype)
    fn = f0 * harmonics[None, None, :]                      # (B, T, dim)
    rad = (fn / sampling_rate) % 1.0

    if not deterministic and key is not None:
        rand_ini = jax.random.uniform(jax.random.fold_in(key, 0), (b, dim))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)

    # (B, dim, T) -> decimate -> integrate -> upsample phase
    rad_cf = jnp.swapaxes(rad, 1, 2)
    rad_lo = interpolate_linear(rad_cf, scale_factor=1.0 / upsample_scale)
    phase_lo = jnp.cumsum(jnp.swapaxes(rad_lo, 1, 2), axis=1) * (2.0 * jnp.pi)
    phase = interpolate_linear(
        jnp.swapaxes(phase_lo, 1, 2) * upsample_scale, scale_factor=float(upsample_scale)
    )
    sines = jnp.sin(jnp.swapaxes(phase, 1, 2))              # (B, T, dim)

    sine_waves = sines * sine_amp
    uv = (f0 > voiced_threshold).astype(f0.dtype)           # (B, T, 1)
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    if deterministic or key is None:
        noise = jnp.zeros_like(sine_waves)
    else:
        noise = noise_amp * jax.random.normal(jax.random.fold_in(key, 1), sine_waves.shape)
    sine_waves = sine_waves * uv + noise
    return sine_waves, uv, noise


def source_module_apply(
    params: Dict,
    key: Optional[jax.Array],
    f0: jnp.ndarray,                 # (B, T_audio, 1)
    upsample_scale: int,
    sampling_rate: int = 24000,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
    voiced_threshold: float = 10.0,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (harmonic_source (B,T,1), noise_source (B,T,1), uv (B,T,1))."""
    sine_wavs, uv, _ = sine_gen(
        key, f0, upsample_scale, sampling_rate, harmonic_num,
        sine_amp=sine_amp, voiced_threshold=voiced_threshold,
        deterministic=deterministic,
    )
    # The reference treats the sine bank as a frozen source (no_grad);
    # mirror that so gradients only flow through the merge projection.
    sine_wavs = jax.lax.stop_gradient(sine_wavs)
    p = params["l_linear"]
    sine_merge = jnp.tanh(linear(sine_wavs, p["weight"], p["bias"]))
    if deterministic or key is None:
        noise = jnp.zeros_like(uv)
    else:
        noise = jax.random.normal(jax.random.fold_in(key, 2), uv.shape) * sine_amp / 3.0
    return sine_merge, noise, uv
