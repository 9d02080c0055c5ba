"""STFT / iSTFT in pure JAX with torch-compatible semantics.

These are the TPU-native replacements for the reference's uses of
``torch.stft`` / ``torch.istft`` (ref: Modules/istftnet.py:83-109,
Modules/discriminators.py:11-25, losses.py:252-268).  Numerics are designed to
match torch bit-for-bit in float32:

- centered frames with reflect padding of ``n_fft // 2``
- periodic Hann window of ``win_length`` zero-padded symmetrically to ``n_fft``
- onesided rfft
- iSTFT overlap-add normalized by the summed squared window, with the center
  padding trimmed

The overlap-add uses a shifted-slice decomposition (no scatter) whenever
``n_fft % hop_length == 0`` — this is the hot path for the iSTFTNet vocoder
head (n_fft=20, hop=5) and maps to plain adds XLA fuses well.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# DFT implementation selection
#
# TPUs have no FFT hardware; XLA's Fft HLO is far slower there than the same
# transform written as two real matmuls against a cos/sin basis (which lands
# on the MXU).  CPU keeps the true FFT (faster there, and bit-exact for the
# golden tests).  ``set_dft_impl`` overrides; "auto" resolves per backend.
# ---------------------------------------------------------------------------

_DFT_IMPL = os.environ.get("STYLETTS2_DFT", "auto")  # auto | matmul | fft


def set_dft_impl(impl: str) -> None:
    global _DFT_IMPL
    assert impl in ("auto", "matmul", "fft"), impl
    _DFT_IMPL = impl


def _use_matmul_dft() -> bool:
    if _DFT_IMPL != "auto":
        return _DFT_IMPL == "matmul"
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _rdft_basis(n_fft: int):
    """rfft as matmul: X = frames @ (cos - i sin), shapes (n_fft, n_bins).

    Cached as NUMPY: a jnp array materialized inside a jit trace is a
    trace-local constant and caching it across traces leaks tracers."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _irdft_basis(n_fft: int):
    """irfft as matmul: x = re @ C + im @ S, shapes (n_bins, n_fft).

    Hermitian weights: bins 0 and n_fft/2 count once, the rest twice."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_bins, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    return ((w * np.cos(ang) / n_fft).astype(np.float32),
            (-w * np.sin(ang) / n_fft).astype(np.float32))


def _rfft(frames: jnp.ndarray) -> jnp.ndarray:
    """rfft over the last axis, MXU matmul on TPU / true FFT elsewhere."""
    if not _use_matmul_dft():
        return jnp.fft.rfft(frames, axis=-1)
    cos, sin = (jnp.asarray(a) for a in _rdft_basis(frames.shape[-1]))
    p = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos, precision=p)
    im = -jnp.matmul(frames, sin, precision=p)
    return jax.lax.complex(re, im)


def _irfft(spec: jnp.ndarray, n: int) -> jnp.ndarray:
    """irfft over the last axis (length-n output)."""
    if not _use_matmul_dft():
        return jnp.fft.irfft(spec, n=n, axis=-1)
    c, s = (jnp.asarray(a) for a in _irdft_basis(n))
    p = jax.lax.Precision.HIGHEST
    return (jnp.matmul(jnp.real(spec), c, precision=p)
            + jnp.matmul(jnp.imag(spec), s, precision=p))


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, equal to ``torch.hann_window(win_length)``."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _padded_window(window: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Center-pad a window of length ``win_length`` to ``n_fft`` (torch.stft rule)."""
    win_length = window.shape[0]
    if win_length == n_fft:
        return window
    left = (n_fft - win_length) // 2
    return jnp.pad(window, (left, n_fft - win_length - left))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Slice ``x`` (..., T) into overlapping frames (..., n_frames, n_fft).

    ``T`` must already include any centering padding; frames are
    ``x[..., t*hop : t*hop + n_fft]`` for ``t in [0, (T - n_fft)//hop]``.

    Custom VJP: framing is linear and its transpose is exactly overlap-add,
    so the backward runs through ``_overlap_add``'s dense shifted-slice
    decomposition instead of the scatter-add autodiff would emit for the
    vmapped dynamic slices (the STFT backward measured 17 ms vs 6.3 ms
    forward at the mel-loss training shapes before this).
    """
    total = x.shape[-1]
    n_frames = 1 + (total - n_fft) // hop_length
    # Gather-free framing: one strided slice per in-frame offset group.
    idx = jnp.arange(n_frames) * hop_length
    frames = jax.vmap(
        lambda start: jax.lax.dynamic_slice_in_dim(x, start, n_fft, axis=-1),
        out_axes=-2,
    )(idx)
    return frames


def _frame_signal_fwd(x, n_fft, hop_length):
    return frame_signal(x, n_fft, hop_length), x.shape[-1]


def _frame_signal_bwd(n_fft, hop_length, total, g):
    return (_overlap_add(g, hop_length, total),)


frame_signal.defvjp(_frame_signal_fwd, _frame_signal_bwd)


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT of ``x`` (..., T) -> (..., n_fft//2 + 1, n_frames).

    Matches ``torch.stft(..., return_complex=True)`` with default arguments.
    """
    # FFTs and windowing stay in float32 regardless of the surrounding
    # compute dtype (bf16 phase/spectral math audibly degrades output).
    x = x.astype(jnp.float32)
    if window is None:
        window = hann_window(win_length, x.dtype)
    window = _padded_window(window, n_fft)
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pad_widths, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length) * window
    spec = _rfft(frames)
    return jnp.swapaxes(spec, -1, -2)


def _overlap_add(frames: jnp.ndarray, hop_length: int, total: int) -> jnp.ndarray:
    """OLA of (..., n_frames, n_fft) into (..., total)."""
    n_frames, n_fft = frames.shape[-2], frames.shape[-1]
    lead = frames.shape[:-2]
    # Shifted-slice decomposition: chunk every frame into hop-sized pieces;
    # piece c of all frames forms a contiguous signal placed at offset c*hop.
    # Non-divisible hops (the MRD STFT resolutions, Whisper's 400/160) are
    # handled by zero-padding the frame axis up to a hop multiple — still
    # fully dense, where a scatter-add fallback measured 2x SLOWER than even
    # autodiff's transpose of the vmapped framing slices.
    n_chunks = -(-n_fft // hop_length)
    if n_fft % hop_length:
        frames = jnp.pad(
            frames,
            [(0, 0)] * (len(lead) + 1) + [(0, n_chunks * hop_length - n_fft)])
    chunks = frames.reshape(*lead, n_frames, n_chunks, hop_length)
    out = jnp.zeros((*lead, total), frames.dtype)
    base_len = n_frames * hop_length
    for c in range(n_chunks):
        seg = chunks[..., :, c, :].reshape(*lead, base_len)
        start = c * hop_length
        seg = jnp.pad(
            seg,
            [(0, 0)] * len(lead) + [(start, max(0, total - start - base_len))],
        )[..., :total]
        out = out + seg
    return out


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    length: Optional[int] = None,
    eps: float = 1e-11,
) -> jnp.ndarray:
    """Inverse STFT of (..., n_fft//2+1, n_frames) -> (..., T).

    Matches ``torch.istft`` with default arguments (window-squared OLA
    normalization, center trim).
    """
    if window is None:
        window = hann_window(win_length, jnp.float32)
    window = _padded_window(window, n_fft)

    frames = _irfft(jnp.swapaxes(spec, -1, -2), n_fft)
    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)

    signal = _overlap_add(frames * window, hop_length, total)
    # Squared-window envelope shared across batch.
    env = _overlap_add(
        jnp.broadcast_to(window * window, (n_frames, n_fft)), hop_length, total
    )
    signal = signal / jnp.maximum(env, eps)

    if center:
        trim = n_fft // 2
        signal = signal[..., trim: total - trim]
    if length is not None:
        signal = signal[..., :length]
        if signal.shape[-1] < length:
            pad_widths = [(0, 0)] * (signal.ndim - 1) + [(0, length - signal.shape[-1])]
            signal = jnp.pad(signal, pad_widths)
    return signal


# ---------------------------------------------------------------------------
# Small-FFT conv fast path (the iSTFTNet vocoder head: n_fft=20, hop=5)
#
# The framed formulation materializes (B, n_frames, n_fft) with n_fft on the
# TPU lane axis: at n_fft=20 every pass pads 20 -> 128 lanes (6.4x HBM
# blowup), and the harmonic-source STFT alone measured ~115 ms of the
# batch-128 inference call (scripts/probe_src.py, round 5).  For small
# divisible hops the DFT IS a strided conv: re/im[k, t] = sum_j
# window[j]*basis[j,k] * x[hop*t + j], i.e. one conv1d with 2*n_bins output
# channels — channel-first end to end, no frames tensor; the inverse is the
# matching conv_transpose plus a STATIC numpy window-envelope division.
# Exact same sums as the matmul-DFT path up to f32 reassociation.
# ---------------------------------------------------------------------------

def _use_conv_dft(n_fft: int, hop_length: int, window) -> bool:
    return (window is None and n_fft % hop_length == 0 and n_fft <= 64
            and _use_matmul_dft())


@functools.lru_cache(maxsize=None)
def _np_hann_padded(win_length: int, n_fft: int) -> np.ndarray:
    n = np.arange(win_length)
    w = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)
    left = (n_fft - win_length) // 2
    return np.pad(w, (left, n_fft - win_length - left))


@functools.lru_cache(maxsize=None)
def _stft_conv_kernel(n_fft: int, win_length: int) -> np.ndarray:
    """(2*n_bins, 1, n_fft) kernel: rows [cos*win | -sin*win]."""
    cos, sin = _rdft_basis(n_fft)                  # (n_fft, n_bins)
    win = _np_hann_padded(win_length, n_fft)[:, None]
    return np.concatenate([(cos * win).T, (-sin * win).T],
                          axis=0)[:, None, :].astype(np.float32)


@functools.lru_cache(maxsize=None)
def _istft_conv_kernel(n_fft: int, win_length: int) -> np.ndarray:
    """(2*n_bins, 1, n_fft) transpose-conv kernel: rows [C*win | S*win]."""
    c, s_ = _irdft_basis(n_fft)                    # (n_bins, n_fft)
    win = _np_hann_padded(win_length, n_fft)[None, :]
    return np.concatenate([c * win, s_ * win], axis=0)[:, None, :].astype(np.float32)


@functools.lru_cache(maxsize=None)
def _np_envelope(n_fft: int, win_length: int, hop_length: int,
                 n_frames: int, eps: float) -> np.ndarray:
    """Static squared-window OLA envelope (torch.istft normalizer)."""
    win = _np_hann_padded(win_length, n_fft)
    total = n_fft + hop_length * (n_frames - 1)
    env = np.zeros(total, np.float32)
    for t in range(n_frames):
        env[t * hop_length: t * hop_length + n_fft] += win * win
    return np.maximum(env, eps)


def stft_mag_phase(x, n_fft, hop_length, win_length, window=None):
    """(magnitude, phase-angle) pair, the reference ``TorchSTFT.transform``
    The imaginary part is nudged by +0.0 so exact zeros take the +0.0 IEEE
    sign: ``atan2(+0.0, -x) = +pi``, matching torch.angle on bins whose
    imaginary part cancels exactly (jax's rfft emits -0.0 there, which would
    flip the phase to -pi — a 2*pi jump in the downstream conv inputs).
    (ref: Modules/istftnet.py:91-97)."""
    if _use_conv_dft(n_fft, hop_length, window):
        xf = x.astype(jnp.float32)
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (xf.ndim - 1) + [(pad, pad)]
        xf = jnp.pad(xf, pad_widths, mode="reflect")
        lead = xf.shape[:-1]
        w = jnp.asarray(_stft_conv_kernel(n_fft, win_length))
        y = jax.lax.conv_general_dilated(
            xf.reshape(-1, 1, xf.shape[-1]), w,
            window_strides=(hop_length,), padding=((0, 0),),
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST)
        y = y.reshape(*lead, 2 * (n_fft // 2 + 1), y.shape[-1])
        re, im = jnp.split(y, 2, axis=-2)
        spec = jax.lax.complex(re, im)
    else:
        spec = stft(x, n_fft, hop_length, win_length, window)
    im = jnp.imag(spec)
    im = jnp.where(im == 0.0, 0.0, im)  # -0.0 -> +0.0 (XLA-fold-proof)
    phase = jnp.arctan2(im, jnp.real(spec))
    return jnp.abs(spec), phase


def istft_from_mag_phase(mag, phase, n_fft, hop_length, win_length, window=None, length=None):
    """Inverse of :func:`stft_mag_phase` (ref: Modules/istftnet.py:99-104)."""
    if _use_conv_dft(n_fft, hop_length, window):
        from ..nn.activations import cos_poly, sin_poly

        magf = mag.astype(jnp.float32)
        phf = phase.astype(jnp.float32)
        # polynomial sin/cos: the phase here is an angle in [-pi, pi] (the
        # vocoder head's sin output or an atan2), so the round-based
        # reduction is nearly free and XLA's Payne-Hanek lowering (~9x an
        # HBM pass) is avoided; ~6e-7 agreement (PARITY.md budget table)
        re = magf * cos_poly(phf)
        im = magf * sin_poly(phf)
        z = jnp.concatenate([re, im], axis=-2)     # (..., 2*n_bins, n_frames)
        lead, n_frames = z.shape[:-2], z.shape[-1]
        w = jnp.asarray(_istft_conv_kernel(n_fft, win_length))
        # transpose conv: out[hop*t + j] += sum_c z[c, t] * w[c, 0, j]
        from ..nn.conv import conv_transpose1d

        sig = conv_transpose1d(z.reshape(-1, z.shape[-2], n_frames), w,
                               stride=hop_length,
                               precision=jax.lax.Precision.HIGHEST)
        total = n_fft + hop_length * (n_frames - 1)
        env = jnp.asarray(_np_envelope(n_fft, win_length, hop_length,
                                       n_frames, 1e-11))
        sig = (sig[:, 0, :] / env).reshape(*lead, total)
        trim = n_fft // 2
        sig = sig[..., trim: total - trim]
        if length is not None:
            sig = sig[..., :length]
            if sig.shape[-1] < length:
                pad_widths = [(0, 0)] * (sig.ndim - 1) + [(0, length - sig.shape[-1])]
                sig = jnp.pad(sig, pad_widths)
        return sig
    spec = mag * jnp.exp(1j * phase)
    return istft(spec.astype(jnp.complex64), n_fft, hop_length, win_length, window, length=length)
