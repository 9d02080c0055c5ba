"""Fused AdaIN + Snake Pallas TPU kernel (forward + custom backward).

The istftnet/hifigan MRF resblocks interleave ``AdaIN1d -> Snake`` pairs with
dilated convs (ref: Modules/istftnet.py:27-81).  Under XLA the pair costs ~4x
the convs it feeds (measured 26 ms elementwise vs 6.6 ms convs per resblock
at stage-2 shapes): the instance-norm statistics force extra full passes over
the (B, C, T) activation in f32 and the sin/affine chain lands in separate
fusions.  This kernel does the whole pair in ONE pass over VMEM-resident
tiles: masked mean/var, normalize, style affine, snake — one HBM read and one
write; the backward kernel recomputes x_hat from saved (mean, rstd) and
produces dx plus all parameter gradients in a second single pass.

Layout: grid (B, C/C_TILE); each program owns a (C_TILE, T) tile — T on
lanes, channels on sublanes; the T-axis reductions are lane reductions Mosaic
handles densely.  Per-channel values (style gamma/beta, alpha, saved stats,
parameter grads) travel as (B, C, 8) "lane planes" — value v at lane v — so
every block is a legal (C_TILE, 8) tile and the (C_TILE, 1) broadcasts fall
out of static lane slices.  Statistics are masked by ``lengths`` (padded
batches); padded positions still produce outputs/gradients (downstream convs
consume them), only the statistics terms are masked — matching
``nn.norm.masked_instance_norm1d``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
LANES = 8  # lane-plane width: values at lanes 0..2, rest padding


def _pick_c_tile(c: int) -> int:
    for t in (32, 16, 8, 4, 2, 1):
        if c % t == 0:
            return t
    return 1


def _fwd_kernel(lens_ref, x_ref, p_ref, y_ref, stats_ref):
    bi = pl.program_id(0)
    t = x_ref.shape[-1]
    x = x_ref[...].astype(jnp.float32)                      # (C_TILE, T)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    n_valid = lens_ref[bi]
    mask = t_idx < n_valid
    n = n_valid.astype(jnp.float32)

    xm = jnp.where(mask, x, 0.0)
    mean = jnp.sum(xm, axis=1, keepdims=True) / n           # (C_TILE, 1)
    diff = jnp.where(mask, x - mean, 0.0)
    var = jnp.sum(diff * diff, axis=1, keepdims=True) / n
    rstd = jax.lax.rsqrt(var + EPS)
    xhat = (x - mean) * rstd

    pp = p_ref[...]                                         # (C_TILE, 8) f32
    g = pp[:, 0:1]
    beta = pp[:, 1:2]
    a = pp[:, 2:3]
    u = (1.0 + g) * xhat + beta
    sau = jnp.sin(a * u)
    y = u + sau * sau / a

    y_ref[...] = y.astype(y_ref.dtype)
    stats = jnp.concatenate([mean, rstd], axis=1)           # (C_TILE, 2)
    stats_ref[...] = jnp.pad(stats, ((0, 0), (0, LANES - 2)))


def _bwd_kernel(lens_ref, x_ref, p_ref, stats_ref, dy_ref, dx_ref, dp_ref):
    bi = pl.program_id(0)
    t = x_ref.shape[-1]
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    pp = p_ref[...]
    g1 = 1.0 + pp[:, 0:1]
    beta = pp[:, 1:2]
    a = pp[:, 2:3]
    st = stats_ref[...]
    mean = st[:, 0:1]
    rstd = st[:, 1:2]

    t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    n_valid = lens_ref[bi]
    mask = t_idx < n_valid
    n = n_valid.astype(jnp.float32)

    xhat = (x - mean) * rstd
    u = g1 * xhat + beta
    sau = jnp.sin(a * u)
    s2au = jnp.sin(2.0 * a * u)

    # snake backward: y = u + sin^2(a u)/a
    du = dy * (1.0 + s2au)
    da = jnp.sum(dy * (u * s2au / a - sau * sau / (a * a)),
                 axis=1, keepdims=True)

    db = jnp.sum(du, axis=1, keepdims=True)
    dg = jnp.sum(du * xhat, axis=1, keepdims=True)

    # instance-norm backward; statistics were over valid positions only, so
    # the correction terms apply there, while every position keeps its
    # direct rstd-scaled term.
    dxhat = du * g1
    s1 = jnp.sum(dxhat, axis=1, keepdims=True)
    s2 = jnp.sum(dxhat * xhat, axis=1, keepdims=True)
    corr = (s1 + xhat * s2) / n
    dx = rstd * (dxhat - jnp.where(mask, corr, 0.0))

    dx_ref[...] = dx.astype(dx_ref.dtype)
    dp = jnp.concatenate([dg, db, da], axis=1)              # (C_TILE, 3)
    dp_ref[...] = jnp.pad(dp, ((0, 0), (0, LANES - 3)))


def _specs(c_tile: int, t: int):
    return dict(
        x=pl.BlockSpec((None, c_tile, t), lambda i, j, *_: (i, j, 0)),
        plane=pl.BlockSpec((None, c_tile, LANES), lambda i, j, *_: (i, j, 0)),
    )


def _pack_params(gamma, beta, alpha):
    """(B, C) gamma/beta + (C,) alpha -> (B, C, 8) f32 lane plane."""
    b, c = gamma.shape
    a = jnp.broadcast_to(alpha[None, :], (b, c))
    plane = jnp.stack([gamma, beta, a], axis=-1).astype(jnp.float32)
    return jnp.pad(plane, ((0, 0), (0, 0), (0, LANES - 3)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(x, gamma, beta, alpha, lengths, interpret=False):
    b, c, t = x.shape
    c_tile = _pick_c_tile(c)
    sp = _specs(c_tile, t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, c // c_tile),
        in_specs=[sp["x"], sp["plane"]],
        out_specs=[sp["x"], sp["plane"]],
    )
    y, stats = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, c, t), x.dtype),
            jax.ShapeDtypeStruct((b, c, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(lengths, x, _pack_params(gamma, beta, alpha))
    return y, stats


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(x, gamma, beta, alpha, stats, lengths, dy, interpret=False):
    b, c, t = x.shape
    c_tile = _pick_c_tile(c)
    sp = _specs(c_tile, t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, c // c_tile),
        in_specs=[sp["x"], sp["plane"], sp["plane"], sp["x"]],
        out_specs=[sp["x"], sp["plane"]],
    )
    dx, dp = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, c, t), x.dtype),
            jax.ShapeDtypeStruct((b, c, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(lengths, x, _pack_params(gamma, beta, alpha), stats, dy)
    return dx, dp[..., 0], dp[..., 1], dp[..., 2]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def adain_snake_pallas(x, gamma, beta, alpha, lengths, interpret=False):
    """Fused ``snake(adain(x), alpha)`` on (B, C, T).

    gamma/beta: (B, C) style affine; alpha: (C,); lengths: (B,) int32 valid
    frames (pass T for unmasked).  Returns y with x's dtype; gradients flow
    to x, gamma, beta, alpha.
    """
    y, _ = _fwd_call(x, gamma, beta, alpha, lengths, interpret=interpret)
    return y


def _vjp_fwd(x, gamma, beta, alpha, lengths, interpret=False):
    y, stats = _fwd_call(x, gamma, beta, alpha, lengths, interpret=interpret)
    return y, (x, gamma, beta, alpha, stats, lengths)


def _vjp_bwd(interpret, res, dy):
    x, gamma, beta, alpha, stats, lengths = res
    dx, dg, db, da_bc = _bwd_call(x, gamma, beta, alpha, stats,
                                  lengths, dy, interpret=interpret)
    da = jnp.sum(da_bc, axis=0)
    return (dx, dg.astype(gamma.dtype), db.astype(beta.dtype),
            da.astype(alpha.dtype), None)


adain_snake_pallas.defvjp(_vjp_fwd, _vjp_bwd)
