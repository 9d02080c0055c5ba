"""Monotonic maximum-path (Viterbi) alignment, on-device.

Replaces the external Cython ``monotonic_align`` package the reference
round-trips through the host for (ref: utils.py:11-24).  The DP runs as a
``lax.scan`` over mel frames with the text axis vectorized (anti-diagonal
wavefront is implicit: each frame's row only depends on the previous frame's
row), followed by a reverse backtracking scan.  Everything is batched and
jittable; no host transfer.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def mask_from_lens(text_lengths: jnp.ndarray, mel_lengths: jnp.ndarray,
                   t_text: int, t_mel: int) -> jnp.ndarray:
    """(B, T_text, T_mel) validity mask (ref: monotonic_align.mask_from_lens)."""
    tm = jnp.arange(t_text)[None, :, None] < text_lengths[:, None, None]
    mm = jnp.arange(t_mel)[None, None, :] < mel_lengths[:, None, None]
    return tm & mm


def maximum_path(
    values: jnp.ndarray,        # (B, T_text, T_mel) soft alignment scores
    text_lengths: jnp.ndarray,  # (B,)
    mel_lengths: jnp.ndarray,   # (B,)
) -> jnp.ndarray:
    """Hard monotonic path maximizing the score sum; returns one-hot
    (B, T_text, T_mel) with exactly one text index per valid mel frame.

    Matches the Cython ``maximum_path_c`` semantics: path starts at (0, 0),
    ends at (text_len-1, mel_len-1), advancing text by 0 or 1 per mel frame.
    """
    b, t_text, t_mel = values.shape
    x_idx = jnp.arange(t_text)

    valid_x = x_idx[None, :] < text_lengths[:, None]          # (B, T_text)

    def fwd(prev_row, inp):
        y, col = inp                                          # col: (B, T_text)
        stay = prev_row                                       # from (x, y-1)
        advance = jnp.concatenate(
            [jnp.full((b, 1), NEG_INF), prev_row[:, :-1]], axis=1)  # from (x-1, y-1)
        # x == y forces an advance (can't have stayed on row x since frame x)
        stay = jnp.where(x_idx[None, :] == y, NEG_INF, stay)
        best = jnp.maximum(stay, advance)
        # frame 0, token 0 starts at zero
        best = jnp.where((y == 0) & (x_idx[None, :] == 0), 0.0, best)
        # unreachable region x > y
        best = jnp.where(x_idx[None, :] > y, NEG_INF, best)
        row = best + col
        row = jnp.where(valid_x, row, NEG_INF)
        return row, row

    cols = jnp.swapaxes(values, 0, 2).swapaxes(1, 2)          # (T_mel, B, T_text)
    init = jnp.full((b, t_text), NEG_INF)
    _, v = jax.lax.scan(fwd, init, (jnp.arange(t_mel), cols), unroll=4)
    v = jnp.swapaxes(v, 0, 1).swapaxes(1, 2)                  # (B, T_text, T_mel)

    # Backtrack from (text_len-1, mel_len-1) down to frame 0.
    def bwd(idx, inp):
        y, v_prev_col = inp                                   # v[:, :, y-1] (B, T_text)
        at_end = y == mel_lengths - 1
        idx = jnp.where(at_end, text_lengths - 1, idx)
        active = y < mel_lengths
        row = (x_idx[None, :] == idx[:, None]) & active[:, None]

        v_at = jnp.take_along_axis(v_prev_col, idx[:, None], axis=1)[:, 0]
        v_left = jnp.take_along_axis(
            v_prev_col, jnp.maximum(idx - 1, 0)[:, None], axis=1)[:, 0]
        move = (idx != 0) & ((idx == y) | (v_at < v_left)) & active
        idx = jnp.where(move, idx - 1, idx)
        return idx, row

    ys = jnp.arange(t_mel - 1, -1, -1)
    v_prev = jnp.concatenate([jnp.full((b, t_text, 1), NEG_INF), v[:, :, :-1]], axis=2)
    v_prev_cols = jnp.swapaxes(v_prev, 0, 2).swapaxes(1, 2)[ys]  # (T_mel, B, T_text) reversed
    _, rows = jax.lax.scan(bwd, jnp.zeros((b,), jnp.int32), (ys, v_prev_cols), unroll=4)
    path = jnp.swapaxes(rows[::-1], 0, 1).swapaxes(1, 2)      # (B, T_text, T_mel)
    return path.astype(values.dtype)


#: "auto" (Pallas on a TPU default backend), "pallas", or "scan".  The
#: CPU-mesh dryrun overrides to "scan" because the default backend can be a
#: TPU while the mesh devices are virtual CPUs.
MAXIMUM_PATH_IMPL = "auto"


def set_maximum_path_impl(impl: str):
    global MAXIMUM_PATH_IMPL
    assert impl in ("auto", "pallas", "scan")
    MAXIMUM_PATH_IMPL = impl


def maximum_path_auto(values, text_lengths, mel_lengths):
    """Backend-dispatching maximum path: the Pallas kernel on TPU (two
    orders of magnitude faster to compile than the unrolled scan pair, same
    runtime), the scan DP elsewhere."""
    impl = MAXIMUM_PATH_IMPL
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    if impl == "pallas":
        from .pallas.monotonic_kernel import maximum_path_pallas

        return maximum_path_pallas(values, text_lengths, mel_lengths).astype(values.dtype)
    return maximum_path(values, text_lengths, mel_lengths)
