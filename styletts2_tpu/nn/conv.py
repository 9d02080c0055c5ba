"""Convolution ops with torch-compatible weight layouts.

All functions take channels-first activations and torch-layout kernels so a
torch ``state_dict`` converts key-for-key with no transposition:

- conv1d:           x (B, C, T),       w (out, in/groups, K)
- conv2d:           x (B, C, H, W),    w (out, in/groups, KH, KW)
- conv_transpose1d: x (B, C, T),       w (in, out/groups, K)
- conv_transpose2d: x (B, C, H, W),    w (in, out/groups, KH, KW)

These wrap ``lax.conv_general_dilated`` which XLA maps onto the MXU; keeping
channels-first matches both torch semantics and the TPU-friendly practice of
putting the contraction dims adjacent.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOrPair = Union[int, Tuple[int, int]]


def mxu_conv_forms() -> bool:
    """Whether the MXU-shaped conv rewrites (``conv1d_folded``,
    ``conv_transpose1d_subpixel``) should be used by model code.

    Both forms trade extra paper FLOPs for 128-lane MXU utilization — a
    measured win on TPU (NOTES_ROUND4.md) and a pure loss on CPU meshes,
    where the folded form multiplies FLOPs by up to 8x at small widths (it
    made the 8-virtual-device dryrun step heavy enough to flirt with XLA's
    40 s collective rendezvous window).  Gate on the default backend;
    ``STYLETTS2_MXU_CONV_FORMS=1/0`` overrides either way.
    """
    import os

    force = os.environ.get("STYLETTS2_MXU_CONV_FORMS")
    if force is not None:
        return force == "1"
    return jax.default_backend() == "tpu"


def _pair(v: IntOrPair) -> Tuple[int, int]:
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

def _match_dtypes(x, w):
    """Promote activation/kernel to a common dtype (bf16 kernels meeting
    fp32-pinned activations promote to fp32; lax.conv requires equal dtypes)."""
    dt = jnp.promote_types(x.dtype, w.dtype)
    return x.astype(dt), w.astype(dt)



def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: Union[int, Tuple[int, int]] = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    pad = (padding, padding) if isinstance(padding, int) else tuple(padding)
    x, w = _match_dtypes(x, w)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=(pad,),
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: IntOrPair = 1,
    padding: Union[int, Tuple[int, int], Sequence[Tuple[int, int]]] = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    elif isinstance(padding, (tuple, list)) and padding and isinstance(padding[0], int):
        pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    else:
        pad = tuple(padding)
    x, w = _match_dtypes(x, w)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=_pair(stride),
        padding=pad,
        rhs_dilation=_pair(dilation),
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def conv2d_nhwc(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: IntOrPair = 1,
    padding: Union[int, Tuple[int, int], Sequence[Tuple[int, int]]] = 0,
    dilation: IntOrPair = 1,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """conv2d over channels-last activations (B, H, W, C) with the same
    torch-layout kernel (out, in/groups, KH, KW).

    On TPU the NHWC form tiles the small-channel discriminator towers ~25%
    faster than NCHW (channels land on the lane axis); weights stay in
    checkpoint layout — XLA folds the transpose into the conv."""
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    elif padding and isinstance(padding[0], int):
        pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    else:  # sequence of (low, high) pairs — asymmetric padding
        pad = tuple(tuple(p) for p in padding)
    x, w = _match_dtypes(x, w)
    y = lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)),
        window_strides=_pair(stride),
        padding=pad,
        rhs_dilation=_pair(dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    if b is not None:
        y = y + b[None, None, None, :]
    return y


def _transpose_kernel(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """torch transpose-conv kernel (in, out/groups, *K) -> grouped conv kernel
    (out, in/groups, *K) with spatial flip."""
    in_ch = w.shape[0]
    spatial = w.shape[2:]
    # (g, in/g, out/g, *K) -> (g, out/g, in/g, *K) -> (out, in/g, *K)
    wg = w.reshape(groups, in_ch // groups, *w.shape[1:])
    wg = jnp.swapaxes(wg, 1, 2)
    w2 = wg.reshape(groups * w.shape[1], in_ch // groups, *spatial)
    flip_axes = tuple(range(2, 2 + len(spatial)))
    return jnp.flip(w2, axis=flip_axes)


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
    dilation: int = 1,
    precision=None,
) -> jnp.ndarray:
    """Matches torch.nn.functional.conv_transpose1d.

    Implemented as an input-dilated convolution with the spatially-flipped,
    in/out-swapped kernel; padding per side is ``dilation*(K-1) - padding``
    with ``output_padding`` appended on the right.
    """
    k = w.shape[-1]
    x, w = _match_dtypes(x, w)
    w2 = _transpose_kernel(w, groups)
    pad_lo = dilation * (k - 1) - padding
    pad_hi = pad_lo + output_padding
    y = lax.conv_general_dilated(
        x, w2,
        window_strides=(1,),
        padding=((pad_lo, pad_hi),),
        lhs_dilation=(stride,),
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=precision,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv1d_folded(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    dilation: int = 1,
    fold: int = 2,
) -> jnp.ndarray:
    """'same'-padded conv1d with time folded into channels — exact.

    Small-channel convs starve the 128-lane MXU: measured on the v5e, the
    k=11 MRF conv runs at ~5% MFU at C=32 and ~18% at C=64 vs ~55% at
    C=128 (HiFi-GAN's late stages).  Folding ``fold`` consecutive samples
    into the channel axis turns it into a (fold*C)-channel conv with a
    shorter kernel built from the original taps (structural zeros where a
    (phase, row-offset) pair is unused): more FLOPs on paper, far faster on
    the MXU.  Exact up to accumulation order; differentiable (pure lax).
    """
    bsz, c, t = x.shape
    co, ci, k = w.shape
    r = fold
    pad = (k * dilation - dilation) // 2
    offs = [(ro, kk, ro + kk * dilation - pad)
            for ro in range(r) for kk in range(k)]
    d_min = min(o // r for _, _, o in offs)
    d_max = max(o // r for _, _, o in offs)
    kf = d_max - d_min + 1
    x, w = _match_dtypes(x, w)
    wf = jnp.zeros((r * co, r * ci, kf), w.dtype)
    for ro, kk, off in offs:
        pm, delta = off % r, off // r
        wf = wf.at[ro * co:(ro + 1) * co, pm * ci:(pm + 1) * ci,
                   delta - d_min].set(w[:, :, kk])
    tp = -(-t // r) * r
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, tp - t)))
    xf = xp.reshape(bsz, c, tp // r, r)
    xf = jnp.transpose(xf, (0, 3, 1, 2)).reshape(bsz, r * c, tp // r)
    y = lax.conv_general_dilated(
        xf, wf, window_strides=(1,), padding=((-d_min, d_max),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    y = y.reshape(bsz, r, co, tp // r)
    y = jnp.transpose(y, (0, 2, 3, 1)).reshape(bsz, co, tp)[:, :, :t]
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv_transpose1d_subpixel(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jnp.ndarray:
    """conv_transpose1d as a subpixel matmul — exact, MXU-shaped.

    The stride-u transposed conv is re-expressed as ONE dense
    (B*T, nm*Ci) @ (nm*Ci, u*Co) matmul followed by a phase reshape
    (y[to*u + r] = sum_m x[to + m] * w[:, :, r + p - m*u]); the input-dilated
    lax form pushes u-1 zeros per sample through the MXU instead.  Measured
    ~2x on the vocoder's k=20/stride=10 upsampler at bench shapes
    (scripts/layout_probe.py up0: 3.8 vs 7.0 ms).

    Requires ``k - stride - 2*padding + output_padding == 0`` (i.e. output
    length exactly T*stride — every vocoder upsampler), groups=1 — use
    ``conv_transpose1d`` otherwise.
    """
    cin, cout, k = w.shape
    u, p = stride, padding
    assert k - u - 2 * p + output_padding == 0, \
        "subpixel form requires out_len == T*stride"
    x, w = _match_dtypes(x, w)
    m_lo = -((k - 1 - p) // u)
    m_hi = (p + u - 1) // u
    nm = m_hi - m_lo + 1
    zero = jnp.zeros_like(w[:, :, 0])
    cols = []
    for r in range(u):
        rows = [w[:, :, r + p - m * u] if 0 <= r + p - m * u < k else zero
                for m in range(m_lo, m_hi + 1)]
        cols.append(jnp.concatenate(rows, axis=0))       # (nm*Ci, Co)
    big_w = jnp.stack(cols, axis=1).reshape(nm * cin, u * cout)
    xl = jnp.swapaxes(x, 1, 2)                           # (B, T, Ci)
    t = xl.shape[1]
    xp = jnp.pad(xl, ((0, 0), (-m_lo, m_hi), (0, 0)))
    xc = jnp.concatenate([xp[:, mi: mi + t, :] for mi in range(nm)], axis=-1)
    y = (xc @ big_w).reshape(xl.shape[0], t * u, cout)
    if b is not None:
        y = y + b[None, None, :]
    return jnp.swapaxes(y, 1, 2)


def conv_transpose2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: IntOrPair = 1,
    padding: IntOrPair = 0,
    output_padding: IntOrPair = 0,
    groups: int = 1,
    dilation: IntOrPair = 1,
    precision=None,
) -> jnp.ndarray:
    kh, kw = w.shape[-2], w.shape[-1]
    x, w = _match_dtypes(x, w)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    dh, dw = _pair(dilation)
    w2 = _transpose_kernel(w, groups)
    pad_h = (dh * (kh - 1) - ph, dh * (kh - 1) - ph + oph)
    pad_w = (dw * (kw - 1) - pw, dw * (kw - 1) - pw + opw)
    y = lax.conv_general_dilated(
        x, w2,
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        rhs_dilation=(dh, dw),
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision,
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def avg_pool1d(x: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """F.avg_pool1d with stride == window (floor semantics)."""
    t = x.shape[-1] - x.shape[-1] % window
    return x[..., :t].reshape(*x.shape[:-1], t // window, window).mean(axis=-1)


def avg_pool2d(x: jnp.ndarray, window: IntOrPair = 2) -> jnp.ndarray:
    wh, ww = _pair(window)
    h = x.shape[-2] - x.shape[-2] % wh
    w = x.shape[-1] - x.shape[-1] % ww
    x = x[..., :h, :w]
    x = x.reshape(*x.shape[:-2], h // wh, wh, w // ww, ww)
    return x.mean(axis=(-3, -1))


def interpolate_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(scale_factor=2, mode='nearest') on the trailing axis."""
    return jnp.repeat(x, 2, axis=-1)


def interpolate_nearest_2x_2d(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=-1), 2, axis=-2)


def interpolate_linear(x: jnp.ndarray, out_len: Optional[int] = None,
                       scale_factor: Optional[float] = None,
                       align_corners: bool = False) -> jnp.ndarray:
    """F.interpolate(mode='linear') over the trailing axis of (..., C, T).

    Matches torch semantics: with ``scale_factor`` the output length is
    ``floor(T * scale_factor)``; with align_corners=False sample positions are
    ``(i + 0.5) / scale - 0.5`` clamped into range, where the effective scale
    is ``out_len / in_len``.
    """
    t_in = x.shape[-1]
    if out_len is None:
        out_len = int(t_in * scale_factor)
        # torch with an explicit scale_factor uses 1/scale directly in the
        # source-position formula (recompute_scale_factor=False default)
        scale = 1.0 / scale_factor
    else:
        scale = t_in / out_len
    if align_corners and out_len > 1:
        pos = jnp.arange(out_len, dtype=jnp.float32) * (t_in - 1) / (out_len - 1)
    else:
        pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
        pos = jnp.clip(pos, 0.0, t_in - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t_in - 1)
    frac = pos - lo
    xl = jnp.take(x, lo, axis=-1)
    xh = jnp.take(x, hi, axis=-1)
    return xl + (xh - xl) * frac
