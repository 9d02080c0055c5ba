"""Fused MRF-round Pallas TPU kernel: norm -> style affine -> Snake -> dilated
conv (+ optional residual), with chained instance-norm statistics.

Status: OPT-IN (ops.fused.set_mrf_round_impl("pallas")), not the default.
The kernel was built against a chained-rep probe (scripts/probe_chain.py)
showing the AdaIN+Snake pair costing ~2.6 ms vs ~0.5 ms for one HBM pass at
B=16, C=128, T=48000 bf16.  That cost turned out to be the VPU SINE (~9x an
HBM pass), not memory traffic; with the polynomial snake
(nn/activations.py) the plain XLA composition runs the k=11 resblock in
20.5 ms vs 24.9 ms for this kernel — the in-kernel per-tap dots pay a
sublane realignment per tap (~33% MFU vs XLA's conv emitter at 60-70%),
and the im2col rewrite does not lower in Mosaic (lane-concat of
sublane-misaligned slices).  Kept for future Mosaic revisions and as the
reference for the guarded-buffer/chained-stats pattern; exact-parity tests
in tests/test_mrf_fused.py keep it honest.

This kernel does one round in ONE read + ONE write of the (B, T, C)
activation:

  u    = (1 + gamma) * ((x - mean) * rstd) + beta          # AdaIN, given stats
  a    = u + sin(alpha*u)^2 / alpha                        # Snake
  y    = conv1d(a, w, dilation=d) [+ residual]             # dilated MRF conv
  S1_b, M2_b = per-block partial sums of y                 # next round's stats

The *next* round's instance-norm statistics are produced as per-block
(sum, centered-M2) partials combined with Chan's algorithm in XLA
(stats_from_partials), so the separate reduction passes a chained
masked_instance_norm1d would cost disappear entirely — per round the
activation is touched exactly twice.

Layout: activations travel as a guarded channels-last buffer
(B, T_blk * (nblk + 2), C) — T on sublanes, C on lanes — whose first and
last T_blk-blocks are ZERO guards.  The conv halo is read from the
neighbouring blocks (three BlockSpec views of the same buffer), so edge
programs read the guards and zero conv padding falls out with no manual DMA
and no boundary conditionals.  The conv itself is K accumulated
(T_blk, C) @ (C, C) MXU matmuls with VMEM-resident weights and f32
accumulation.

Semantics match the XLA composition in resblock.py exactly: statistics are
masked to valid positions (``lengths``), activation values OUTSIDE [0, T)
are zeroed before the conv (zero conv padding), but values in
[lengths, T) are NOT zeroed — the unfused path leaves them, masking stats
only (ref behaviour: exact-length batch-1 synthesis).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
ROWS = 8  # f32 sublane plane: [mean, rstd, gamma, beta, alpha, bias, 0, 0]


def _round_kernel(lens_ref, xl_ref, xc_ref, xr_ref, plane_ref, w_ref,
                  *rest, k: int, d: int, t_blk: int, t: int, nblk: int,
                  has_residual: bool, emit_stats: bool, out_dtype,
                  conv_mode: str = "taps"):
    if has_residual:
        res_ref = rest[0]
        rest = rest[1:]
    y_ref = rest[0]
    rest = rest[1:]
    parts_ref = rest[0] if emit_stats else None
    if emit_stats:
        rest = rest[1:]
    act_scratch = rest[0] if conv_mode == "scratch" else None

    b = pl.program_id(0)
    j = pl.program_id(1)
    pad = (k * d - d) // 2
    interior = jnp.logical_and(j >= 1, j <= nblk)

    @pl.when(jnp.logical_not(interior))
    def _guard():
        y_ref[...] = jnp.zeros(y_ref.shape, y_ref.dtype)
        if emit_stats:
            parts_ref[...] = jnp.zeros(parts_ref.shape, parts_ref.dtype)

    @pl.when(interior)
    def _body():
        xc = xc_ref[...]
        if pad > 0:
            xl = xl_ref[...][t_blk - pad:, :]
            xr = xr_ref[...][:pad, :]
            xt = jnp.concatenate([xl, xc, xr], axis=0)
        else:
            xt = xc
        xt = xt.astype(jnp.float32)                       # (T_blk + 2p, C)

        plane = plane_ref[...]                              # (ROWS, C) f32
        mean, rstd = plane[0:1], plane[1:2]
        g1 = 1.0 + plane[2:3]
        beta, alpha, bias = plane[3:4], plane[4:5], plane[5:6]

        u = g1 * ((xt - mean) * rstd) + beta
        # snake via range-reduced cosine polynomial (see nn/activations.py:
        # XLA/Mosaic sin costs ~9x an HBM pass)
        from ...nn.activations import _COS2PI
        r = alpha * u * (1.0 / 3.141592653589793)
        r = r - jnp.round(r)
        sq = r * r
        cs = jnp.float32(_COS2PI[-1])
        for c_ in _COS2PI[-2::-1]:
            cs = cs * sq + jnp.float32(c_)
        act = u + (1.0 - cs) / (2.0 * alpha)

        # zero conv padding outside [0, T): halo spilling into the guard
        # blocks or the TP alignment tail must contribute nothing
        p_halo = (j - 1) * t_blk - pad + jax.lax.broadcasted_iota(
            jnp.int32, (t_blk + 2 * pad, 1), 0)
        act = jnp.where(jnp.logical_and(p_halo >= 0, p_halo < t), act, 0.0)
        act = act.astype(out_dtype)                       # bf16 MXU rate

        if conv_mode == "scratch" and k > 1:
            # materialize the activation once in VMEM, then load each tap
            # slice fresh from the scratch ref: the sublane offset becomes a
            # memory address instead of a per-tap register realignment
            act_scratch[...] = act
            acc = jnp.zeros((t_blk, xc.shape[-1]), jnp.float32)
            for kk in range(k):
                tap = act_scratch[kk * d: kk * d + t_blk, :]
                acc = acc + jnp.dot(tap, w_ref[kk],
                                    preferred_element_type=jnp.float32)
        elif conv_mode == "im2col" and k > 1:
            # one (T_blk, K*C) @ (K*C, C) dot: the K*C contraction keeps the
            # MXU pipeline full where K separate C-contraction dots stall it
            c_ = xc.shape[-1]
            xcol = jnp.concatenate(
                [act[kk * d: kk * d + t_blk, :] for kk in range(k)], axis=-1)
            acc = jnp.dot(xcol, w_ref[...].reshape(k * c_, c_),
                          preferred_element_type=jnp.float32)
        else:
            acc = jnp.zeros((t_blk, xc.shape[-1]), jnp.float32)
            for kk in range(k):
                acc = acc + jnp.dot(act[kk * d: kk * d + t_blk, :], w_ref[kk],
                                    preferred_element_type=jnp.float32)
        acc = acc + bias
        if has_residual:
            acc = acc + res_ref[...].astype(jnp.float32)
        y = acc.astype(out_dtype)
        y_ref[...] = y

        if emit_stats:
            # partials of the STORED value (bit-match the unfused chain,
            # which reads the rounded activation back for the next norm)
            yv = y.astype(jnp.float32)
            l_eff = jnp.minimum(lens_ref[b], t)
            p_c = (j - 1) * t_blk + jax.lax.broadcasted_iota(
                jnp.int32, (t_blk, 1), 0)
            m = (p_c < l_eff).astype(jnp.float32)
            n_b = jnp.sum(m)
            s1 = jnp.sum(yv * m, axis=0, keepdims=True)   # (1, C)
            mu_b = s1 / jnp.maximum(n_b, 1.0)
            diff = (yv - mu_b) * m
            m2 = jnp.sum(diff * diff, axis=0, keepdims=True)
            nb_row = jnp.full_like(s1, n_b)
            zero = jnp.zeros_like(s1)
            parts_ref[...] = jnp.concatenate(
                [s1, m2, nb_row] + [zero] * (ROWS - 3), axis=0)


def pack_plane(mean, rstd, gamma, beta, alpha, bias):
    """(B, C) stats/affine + (C,) alpha/bias -> (B, ROWS, C) f32 plane."""
    b, c = mean.shape
    rows = [mean, rstd, gamma, beta,
            jnp.broadcast_to(alpha[None, :], (b, c)),
            jnp.broadcast_to(bias[None, :], (b, c))]
    plane = jnp.stack(rows, axis=1).astype(jnp.float32)
    return jnp.pad(plane, ((0, 0), (0, ROWS - len(rows)), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=("k", "d", "t_blk", "t", "emit_stats", "interpret",
                     "conv_mode"))
def fused_mrf_round(x_pad, plane, wt, lengths, *, k: int, d: int, t_blk: int,
                    t: int, residual=None, emit_stats: bool = True,
                    interpret: bool = False, conv_mode: str = "taps"):
    """One fused round on a guarded channels-last buffer.

    x_pad: (B, T_blk*(nblk+2), C) — rows [T_blk, T_blk+TP) hold data
      positions [0, TP), TP = nblk*T_blk >= t; guard + alignment tail zero.
    plane: (B, ROWS, C) f32 from pack_plane (mean/rstd of x, adain
      gamma/beta, snake alpha, conv bias).
    wt: (K, C_in, C_out) conv kernel (torch (out, in, K) transposed (2,1,0)).
    lengths: (B,) int32 valid positions for the EMITTED statistics.
    residual: optional buffer like x_pad added after the conv.
    Returns (y_pad, partials) with partials (B, nblk+2, ROWS, C) f32 rows
    [S1_b, M2_b, n_b] (None when emit_stats=False).
    """
    bsz, tpg, c = x_pad.shape
    nblk = tpg // t_blk - 2
    pad = (k * d - d) // 2
    assert tpg % t_blk == 0 and nblk >= 1 and pad <= t_blk
    assert t <= nblk * t_blk

    blk = pl.BlockSpec((None, t_blk, c), lambda b, j, *_: (b, j, 0))
    in_specs = [
        pl.BlockSpec((None, t_blk, c),
                     lambda b, j, *_: (b, jnp.maximum(j - 1, 0), 0)),
        blk,
        pl.BlockSpec((None, t_blk, c),
                     lambda b, j, *_: (b, jnp.minimum(j + 1, nblk + 1), 0)),
        pl.BlockSpec((None, ROWS, c), lambda b, j, *_: (b, 0, 0)),
        pl.BlockSpec((wt.shape[0], c, c), lambda b, j, *_: (0, 0, 0)),
    ]
    if residual is not None:
        in_specs.append(blk)
    out_shape = [jax.ShapeDtypeStruct(x_pad.shape, x_pad.dtype)]
    out_specs = [blk]
    if emit_stats:
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, nblk + 2, ROWS, c), jnp.float32))
        out_specs.append(
            pl.BlockSpec((None, None, ROWS, c), lambda b, j, *_: (b, j, 0, 0)))

    kern = functools.partial(
        _round_kernel, k=k, d=d, t_blk=t_blk, t=t, nblk=nblk,
        has_residual=residual is not None, emit_stats=emit_stats,
        out_dtype=x_pad.dtype, conv_mode=conv_mode)
    scratch_shapes = []
    if conv_mode == "scratch":
        scratch_shapes.append(
            pltpu.VMEM((t_blk + 2 * pad, c), x_pad.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, nblk + 2),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    args = [lengths.astype(jnp.int32), x_pad, x_pad, x_pad, plane, wt]
    if residual is not None:
        args.append(residual)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret)(*args)
    if emit_stats:
        return out[0], out[1]
    return out[0], None


def stats_from_partials(partials, lengths, t: int):
    """Combine per-block [S1, M2, n] partials (Chan) -> (mean, rstd) (B, C)."""
    s1 = partials[:, :, 0, :]                              # (B, nblk+2, C)
    m2 = partials[:, :, 1, :]
    nb = partials[:, :, 2, :]
    n = jnp.maximum(jnp.minimum(lengths, t), 1).astype(jnp.float32)[:, None]
    mean = jnp.sum(s1, axis=1) / n
    mu_b = s1 / jnp.maximum(nb, 1.0)
    # Chan combination with EXPLICIT (mu_b - mu)^2 — the difference-of-
    # squares form (sum nb*mu_b^2 - n*mu^2) cancels catastrophically once
    # the snake drifts the mean away from zero
    dev = mu_b - mean[:, None, :]
    m2_tot = jnp.sum(m2, axis=1) + jnp.sum(nb * dev * dev, axis=1)
    var = jnp.maximum(m2_tot, 0.0) / n
    rstd = jax.lax.rsqrt(var + EPS)
    return mean, rstd


# ---------------------------------------------------------------------------
# Guarded-buffer packing
# ---------------------------------------------------------------------------

def pick_t_blk(t: int, target: int = 800) -> int:
    """Largest block <= target that is a multiple of 16 (bf16 sublanes)."""
    if t <= target:
        return max(16, -(-t // 16) * 16)
    return target


def pack_guarded(x_ncw, t_blk: int):
    """(B, C, T) -> guarded (B, T_blk*(nblk+2), C) channels-last buffer."""
    b, c, t = x_ncw.shape
    nblk = -(-t // t_blk)
    tp = nblk * t_blk
    xt = jnp.swapaxes(x_ncw, 1, 2)                         # (B, T, C)
    return jnp.pad(xt, ((0, 0), (t_blk, tp - t + t_blk), (0, 0)))


def unpack_guarded(x_pad, t_blk: int, t: int):
    """Guarded buffer -> (B, C, T)."""
    return jnp.swapaxes(x_pad[:, t_blk: t_blk + t, :], 1, 2)


def masked_stats_guarded(x_pad, lengths, t_blk: int, t: int):
    """(mean, rstd) (B, C) over valid positions of a guarded buffer (XLA).

    Matches nn.norm.masked_instance_norm1d (biased var, eps inside rsqrt);
    used to seed the first fused round of a stage — subsequent rounds chain
    through the kernel's emitted partials.
    """
    xv = x_pad[:, t_blk: t_blk + t, :].astype(jnp.float32)  # (B, T, C)
    keep = (jnp.arange(t)[None, :] < jnp.minimum(lengths, t)[:, None])
    kf = keep[..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(kf, axis=1), 1.0)               # (B, 1)
    mean = jnp.sum(xv * kf, axis=1) / n
    diff = (xv - mean[:, None, :]) * kf
    var = jnp.sum(diff * diff, axis=1) / n
    return mean, jax.lax.rsqrt(var + EPS)
