"""LSTM recurrences as ``lax.scan`` — the TPU replacement for cuDNN LSTMs.

The reference relies on ``nn.LSTM`` + ``pack_padded_sequence`` everywhere
(ref: models.py:385-418, 559-631, 667-722).  Packing is a GPU batching trick;
on TPU we keep static shapes and reproduce its *semantics* with masking:

- forward pass runs over the padded timeline; positions past each sample's
  length are re-masked to zero afterwards (pad_packed_sequence default)
- the backward direction of a BiLSTM starts at ``length - 1`` per sample,
  implemented by reversing only the valid region (gather by index), scanning
  forward, and reversing back

The input projection for all timesteps is hoisted into one large matmul
(MXU-friendly); the scan body is a single (B, H) x (H, 4H) matmul.

Parameter names follow torch (``weight_ih_l0`` …) for key-for-key conversion.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _cell_scan(
    xg: jnp.ndarray,  # (B, T, 4H) precomputed input gates (+ both biases)
    w_hh: jnp.ndarray,  # (4H, H) torch layout
    h0: Optional[jnp.ndarray] = None,
    c0: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    b, t, four_h = xg.shape
    h_dim = four_h // 4
    h = jnp.zeros((b, h_dim), xg.dtype) if h0 is None else h0
    c = jnp.zeros((b, h_dim), xg.dtype) if c0 is None else c0
    w_hh_t = w_hh.T  # (H, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    # unroll amortizes XLA while-loop per-iteration overhead; the recurrence
    # itself stays sequential (small matmuls are latency-bound on TPU)
    (h, c), ys = jax.lax.scan(step, (h, c), jnp.swapaxes(xg, 0, 1), unroll=4)
    return jnp.swapaxes(ys, 0, 1), (h, c)


def lstm_step(params: Dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray,
              prefix: str = "") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single ``nn.LSTMCell`` step (used by the ASR S2S decoder loop)."""
    w_ih = params[f"weight_ih{prefix}"]
    w_hh = params[f"weight_hh{prefix}"]
    gates = x @ w_ih.T + params[f"bias_ih{prefix}"] + h @ w_hh.T + params[f"bias_hh{prefix}"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _reverse_padded(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse the first ``lengths[b]`` steps of every (B, T, ...) sequence."""
    t = x.shape[1]
    pos = jnp.arange(t)[None, :]                      # (1, T)
    src = jnp.clip(lengths[:, None] - 1 - pos, 0, t - 1)
    keep = pos < lengths[:, None]
    src = jnp.where(keep, src, pos)                   # out-of-range stays put
    return jnp.take_along_axis(x, src[..., None].astype(jnp.int32), axis=1) if x.ndim == 3 \
        else jnp.take_along_axis(x, src.astype(jnp.int32), axis=1)


def mask_time(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero positions at or past ``lengths`` along axis 1 of (B, T, ...)."""
    if lengths is None:
        return x
    t = x.shape[1]
    keep = jnp.arange(t)[None, :] < lengths[:, None]
    return x * keep[(...,) + (None,) * (x.ndim - 2)]


def lstm(
    params: Dict,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    layer: str = "l0",
) -> jnp.ndarray:
    """Unidirectional LSTM over (B, T, I) -> (B, T, H), masked past lengths."""
    w_ih = params[f"weight_ih_{layer}"]
    xg = x @ w_ih.T + params[f"bias_ih_{layer}"] + params[f"bias_hh_{layer}"]
    ys, _ = _cell_scan(xg, params[f"weight_hh_{layer}"])
    return mask_time(ys, lengths)


def bilstm(
    params: Dict,
    x: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    layer: str = "l0",
) -> jnp.ndarray:
    """Bidirectional LSTM over (B, T, I) -> (B, T, 2H).

    Equivalent to torch ``nn.LSTM(bidirectional=True)`` on a packed sequence
    followed by ``pad_packed_sequence``: the reverse direction starts at the
    true end of every sample and padded positions are zero.
    """
    # Forward direction
    w_ih = params[f"weight_ih_{layer}"]
    xg = x @ w_ih.T + params[f"bias_ih_{layer}"] + params[f"bias_hh_{layer}"]
    fwd, _ = _cell_scan(xg, params[f"weight_hh_{layer}"])

    # Backward direction on the per-sample reversed valid region
    if lengths is None:
        lengths = jnp.full((x.shape[0],), x.shape[1], dtype=jnp.int32)
    xr = _reverse_padded(x, lengths)
    w_ih_r = params[f"weight_ih_{layer}_reverse"]
    xg_r = xr @ w_ih_r.T + params[f"bias_ih_{layer}_reverse"] + params[f"bias_hh_{layer}_reverse"]
    bwd_r, _ = _cell_scan(xg_r, params[f"weight_hh_{layer}_reverse"])
    bwd = _reverse_padded(bwd_r, lengths)

    out = jnp.concatenate([fwd, bwd], axis=-1)
    return mask_time(out, lengths)
