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

import numpy as np

from ...nn.activations import sin2pi
from ...nn.conv import interpolate_linear
from .. import common as cm


def _upsample_linear_int(x: jnp.ndarray, u: int) -> jnp.ndarray:
    """``interpolate_linear(x, scale_factor=u)`` for integer ``u``, as
    static per-phase broadcast weights instead of a gather.

    Output position ``j = u*t' + r`` samples ``pos = t' + (r+0.5)/u - 0.5``,
    so each of the ``u`` phases mixes a fixed (prev, cur) or (cur, next)
    pair with a static fraction.  Two wins over the gather form:

    - XLA fuses the broadcast chain into consumers where a gather op
      materializes its (B, dim, T_audio) output in HBM (part of the
      measured 26 ms batch-128 sine cost, scripts/probe_src.py round 5);
    - the phase fractions are exact (double-precision statics, like
      torch's F.interpolate double source indices), where the gather form
      computes ``(j+0.5)*(1/u) - 0.5`` in f32 — at audio position j~2e5
      that quantizes the fraction by ~6e-5, i.e. ~1e-2 turns of phase
      error near the end of a 10 s clip.  Closer to the reference, not a
      deviation (PARITY.md approximation table)."""
    t_in = x.shape[-1]
    o = (np.arange(u) + 0.5) / u - 0.5                  # (u,) in (-0.5, 0.5)
    frac = jnp.asarray(np.where(o < 0, 1.0 + o, o).astype(np.float32))
    neg = jnp.asarray(o < 0)
    xm1 = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)   # edge-replicate
    xp1 = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    xl = jnp.where(neg, xm1[..., :, None], x[..., :, None])     # (..., T', u)
    xh = jnp.where(neg, x[..., :, None], xp1[..., :, None])
    out = xl + (xh - xl) * frac
    return out.reshape(*x.shape[:-1], t_in * u)


def init_source_module(key, harmonic_num: int = 8) -> Dict:
    return {"l_linear": cm.init_linear(key, harmonic_num + 1, 1)}


def _sine_gen_cf(
    key: Optional[jax.Array],
    f0_cf: jnp.ndarray,              # (B, 1, T_audio) upsampled F0, 0 when unvoiced
    upsample_scale: int,
    sampling_rate: int = 24000,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 10.0,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Channel-first core: returns (sine_waves, uv, noise) as (B, dim|1, T).

    Everything runs (B, harmonics, T) so the long audio axis sits on the
    TPU's 128-lane dimension; the (B, T, 9) layout wastes 119/128 lanes on
    every elementwise pass (measured: the source branch alone cost 74 ms of
    a 212 ms full-decoder call at bench shapes).  The RNG draws keep the
    reference's (B, T, dim) shapes so injected-noise parity tests stay
    bit-identical, paying one transposed read each.
    """
    # Phase integration must run in float32: a bf16 cumsum over tens of
    # thousands of samples destroys pitch accuracy.
    f0_cf = f0_cf.astype(jnp.float32)
    b, _, t = f0_cf.shape
    dim = harmonic_num + 1
    harmonics = jnp.arange(1, dim + 1, dtype=f0_cf.dtype)
    fn = f0_cf * harmonics[None, :, None]                   # (B, dim, T)
    rad = (fn / sampling_rate) % 1.0

    if not deterministic and key is not None:
        rand_ini = jax.random.uniform(jax.random.fold_in(key, 0), (b, dim))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, :, 0].add(rand_ini)

    # decimate -> integrate -> upsample phase, all (B, dim, T).  The phase
    # stays in *turns* (cycles) end to end: the reference's 2*pi scaling only
    # exists to feed torch.sin, and sin2pi's round-based range reduction on
    # the turns counter is both cheaper (no Payne-Hanek — sin over the
    # audio-rate tensor measured ~9x an HBM pass) and more accurate for a
    # monotone accumulator that reaches ~1e2 turns.
    rad_lo = interpolate_linear(rad, scale_factor=1.0 / upsample_scale)
    turns_lo = jnp.cumsum(rad_lo, axis=-1)
    turns = interpolate_linear(turns_lo * upsample_scale,
                               scale_factor=float(upsample_scale))
    sines = sin2pi(turns)                                   # (B, dim, T)

    sine_waves = sines * sine_amp
    uv = (f0_cf > voiced_threshold).astype(f0_cf.dtype)     # (B, 1, T)
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    if deterministic or key is None:
        noise = jnp.zeros_like(sine_waves)
    else:
        # drawn in the reference's (B, T, dim) shape for bit-exact parity
        noise = noise_amp * jnp.swapaxes(jax.random.normal(
            jax.random.fold_in(key, 1), (b, t, dim)), 1, 2)
    sine_waves = sine_waves * uv + noise
    return sine_waves, uv, noise


def _sine_gen_mel_cf(
    key: Optional[jax.Array],
    f0_mel: jnp.ndarray,             # (B, T_mel) F0 at mel rate, 0 when unvoiced
    upsample_scale: int,
    sampling_rate: int = 24000,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 10.0,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mel-rate sine bank: same values as ``_sine_gen_cf`` on the
    nearest-repeated audio-rate curve, without materializing any audio-rate
    intermediate before the final fused pass.

    Why this is exact, not an approximation: the reference repeats f0 by
    ``u`` to audio rate only to *decimate it straight back* — its linear
    1/u downsample samples positions ``(i+0.5)*u - 0.5`` whose two lerp
    endpoints both land inside frame ``i`` of the repeated curve (for any
    u >= 1), so the decimated ``rad_lo`` equals ``(f0*h/fs) % 1`` computed
    directly at mel rate, bitwise.  (The reference's ``rand_ini`` initial
    phase is added at audio sample 0, which position 149.5 never reads — a
    faithful no-op on both sides; the injected-draw parity tests confirm.)
    The audio-rate tensors that remain (phase upsample -> sin2pi -> merge)
    are a single fusable elementwise chain, vs the old path's ~10
    audio-rate (B, 9, T) f32 passes — measured 154 ms of the 733 ms
    batch-128 inference call (scripts/ablate_decoder.py, round 5).
    """
    f0_mel = f0_mel.astype(jnp.float32)
    b, t_mel = f0_mel.shape
    dim = harmonic_num + 1
    harmonics = jnp.arange(1, dim + 1, dtype=jnp.float32)
    rad_lo = (f0_mel[:, None, :] * harmonics[None, :, None]
              / sampling_rate) % 1.0                         # (B, dim, T_mel)
    turns_lo = jnp.cumsum(rad_lo, axis=-1)
    turns = _upsample_linear_int(turns_lo * upsample_scale, upsample_scale)
    sines = sin2pi(turns)                                    # (B, dim, T_audio)

    sine_waves = sines * sine_amp
    uv_lo = (f0_mel > voiced_threshold).astype(jnp.float32)  # (B, T_mel)
    uv = jnp.repeat(uv_lo[:, None, :], upsample_scale, axis=-1)  # (B, 1, T)
    noise_amp = uv * noise_std + (1.0 - uv) * sine_amp / 3.0
    t = t_mel * upsample_scale
    if deterministic or key is None:
        noise = jnp.zeros_like(sine_waves)
    else:
        # drawn in the reference's (B, T, dim) shape for bit-exact parity
        noise = noise_amp * jnp.swapaxes(jax.random.normal(
            jax.random.fold_in(key, 1), (b, t, dim)), 1, 2)
    sine_waves = sine_waves * uv + noise
    return sine_waves, uv, noise


def source_module_apply_mel(
    params: Dict,
    key: Optional[jax.Array],
    f0_mel: jnp.ndarray,             # (B, T_mel) F0 at mel rate
    upsample_scale: int,
    sampling_rate: int = 24000,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
    voiced_threshold: float = 10.0,
    deterministic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``source_module_apply`` fed directly with the mel-rate F0 curve the
    generators hold (they otherwise nearest-repeat it by ``upsample_scale``
    just for the source to decimate it back — see _sine_gen_mel_cf).
    Returns (harmonic_source (B,T,1), noise_source (B,T,1), uv (B,T,1))."""
    sine_wavs, uv_cf, _ = _sine_gen_mel_cf(
        key, f0_mel, upsample_scale, sampling_rate, harmonic_num,
        sine_amp=sine_amp, voiced_threshold=voiced_threshold,
        deterministic=deterministic,
    )
    sine_wavs = jax.lax.stop_gradient(sine_wavs)      # (B, dim, T)
    p = params["l_linear"]
    # Weighted harmonic merge as a reduce (not a dot): XLA fuses the sine
    # bank's gather -> sin2pi -> mask chain INTO the reduction's input, so
    # the (B, 9, T_audio) f32 bank is never materialized in HBM; a dot op
    # reads materialized operands (measured part of the 26 ms sine cost at
    # batch 128, scripts/probe_src.py).
    w = p["weight"].reshape(-1).astype(jnp.float32)
    merged = (jnp.sum(sine_wavs * w[None, :, None], axis=1, keepdims=True)
              + p["bias"].astype(jnp.float32)[None, :, None])
    sine_merge = jnp.swapaxes(jnp.tanh(merged), 1, 2)  # (B, T, 1)
    uv = jnp.swapaxes(uv_cf, 1, 2)
    if deterministic or key is None:
        noise = jnp.zeros_like(uv)
    else:
        noise = jax.random.normal(jax.random.fold_in(key, 2), uv.shape) * sine_amp / 3.0
    return sine_merge, noise, uv


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
    """Returns (sine_waves, uv, noise), each (B, T_audio, harmonic_num+1[|1]).

    Torch-layout wrapper over the channel-first core (see _sine_gen_cf)."""
    sine_waves, uv, noise = _sine_gen_cf(
        key, jnp.swapaxes(f0, 1, 2), upsample_scale, sampling_rate,
        harmonic_num, sine_amp, noise_std, voiced_threshold, deterministic)
    return (jnp.swapaxes(sine_waves, 1, 2), jnp.swapaxes(uv, 1, 2),
            jnp.swapaxes(noise, 1, 2))


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
    """Returns (harmonic_source (B,T,1), noise_source (B,T,1), uv (B,T,1)).

    Internals run channel-first (see _sine_gen_cf); only the returns are in
    the reference's (B, T, 1) layout."""
    sine_wavs, uv_cf, _ = _sine_gen_cf(
        key, jnp.swapaxes(f0, 1, 2), upsample_scale, sampling_rate,
        harmonic_num, sine_amp=sine_amp, voiced_threshold=voiced_threshold,
        deterministic=deterministic,
    )
    # The reference treats the sine bank as a frozen source (no_grad);
    # mirror that so gradients only flow through the merge projection.
    sine_wavs = jax.lax.stop_gradient(sine_wavs)      # (B, dim, T)
    p = params["l_linear"]
    # linear over the harmonic axis: (B, dim, T) x (1, dim) -> (B, 1, T)
    merged = jnp.einsum("bdt,od->bot", sine_wavs, p["weight"]) + p["bias"][None, :, None]
    sine_merge = jnp.swapaxes(jnp.tanh(merged), 1, 2)  # (B, T, 1)
    uv = jnp.swapaxes(uv_cf, 1, 2)
    if deterministic or key is None:
        noise = jnp.zeros_like(uv)
    else:
        noise = jax.random.normal(jax.random.fold_in(key, 2), uv.shape) * sine_amp / 3.0
    return sine_merge, noise, uv
