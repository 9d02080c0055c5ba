"""Pallas TPU kernel for the monotonic maximum-path DP.

The scan-based implementation in ``ops.monotonic`` launches one XLA loop step
per mel frame; this kernel runs the whole forward DP + backtrack for one
batch element inside a single Pallas program with the score matrix resident
in VMEM — no per-step kernel launches, no HBM traffic between steps.

Memory layout is time-major (t_mel, t_text): every dynamic access inside the
time loop is then a *row* (sublane index) with the text axis contiguous in
lanes — the access pattern Mosaic vectorizes well.  Dynamic lane indexing
(column reads/writes) must be avoided on TPU.

Grid: one program per batch element.  Falls back to interpret mode for
CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(tlens, mlens, values_ref, path_ref, v_scratch):
    """values_ref/path_ref/v_scratch: (t_mel, t_text) for one batch element."""
    i = pl.program_id(0)
    text_len = tlens[i]
    mel_len = mlens[i]
    t_mel = values_ref.shape[0]
    t_text = values_ref.shape[1]

    # Rows are kept 2D (1, t_text): Mosaic's dynamic rotate (roll) does not
    # support 1D vectors.
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (1, t_text), 1)
    valid_x = x_idx < text_len

    def fwd_body(y, prev_row):
        col = values_ref[pl.ds(y, 1), :]
        stay = jnp.where(x_idx == y, NEG_INF, prev_row)
        advance = pltpu.roll(prev_row, 1, 1)
        advance = jnp.where(x_idx == 0, NEG_INF, advance)
        best = jnp.maximum(stay, advance)
        best = jnp.where((y == 0) & (x_idx == 0), 0.0, best)
        best = jnp.where(x_idx > y, NEG_INF, best)
        row = jnp.where(valid_x, best + col, NEG_INF)
        v_scratch[pl.ds(y, 1), :] = row
        return row

    init = jnp.full((1, t_text), NEG_INF, jnp.float32)
    jax.lax.fori_loop(0, t_mel, fwd_body, init)

    path_ref[...] = jnp.zeros((t_mel, t_text), jnp.float32)

    def bwd_body(step, idx):
        y = t_mel - 1 - step
        at_end = y == mel_len - 1
        idx = jnp.where(at_end, text_len - 1, idx)
        active = y < mel_len

        @pl.when(active)
        def _():
            path_ref[pl.ds(y, 1), :] = (x_idx == idx).astype(jnp.float32)

        v_prev = v_scratch[pl.ds(jnp.maximum(y - 1, 0), 1), :]
        v_prev = jnp.where(y > 0, v_prev, NEG_INF)
        v_at = jnp.sum(jnp.where(x_idx == idx, v_prev, 0.0))
        v_left = jnp.sum(jnp.where(x_idx == jnp.maximum(idx - 1, 0), v_prev, 0.0))
        move = (idx != 0) & ((idx == y) | (v_at < v_left)) & active
        return jnp.where(move, idx - 1, idx)

    jax.lax.fori_loop(0, t_mel, bwd_body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(
    values: jnp.ndarray,        # (B, T_text, T_mel) float32
    text_lengths: jnp.ndarray,  # (B,) int32
    mel_lengths: jnp.ndarray,   # (B,) int32
    interpret: bool = False,
) -> jnp.ndarray:
    b, t_text, t_mel = values.shape
    values_tm = jnp.swapaxes(values, 1, 2).astype(jnp.float32)  # (B, T_mel, T_text)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t_mel, t_text), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, t_mel, t_text), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((t_mel, t_text), jnp.float32)],
    )

    path_tm = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_mel, t_text), jnp.float32),
        interpret=interpret,
    )(text_lengths.astype(jnp.int32), mel_lengths.astype(jnp.int32), values_tm)
    return jnp.swapaxes(path_tm, 1, 2)
