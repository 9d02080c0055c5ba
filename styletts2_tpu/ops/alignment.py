"""Duration -> frame alignment construction.

Replaces the reference's host-side Python loops:

- ``hard_alignment``: the inference-time ``pred_aln_trg`` matrix
  (Demo/Inference_LJSpeech.ipynb cell 17 builds it with a Python loop);
  here computed with broadcasted iota against the duration cumsum —
  static-shaped and jittable.
- ``gaussian_alignment``: the SLM-adversarial differentiable soft alignment
  (ref: Modules/slmadv.py:112-134): duration logits convolved with Gaussian
  windows centered at cumsum midpoints, softmaxed over the text axis.  The
  per-sample grouped conv1d becomes one einsum.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def hard_alignment(durations: jnp.ndarray, t_mel: int,
                   text_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One-hot (.., T_text, t_mel) alignment: token i covers frames
    [cumsum[i-1], cumsum[i]).

    ``durations``: (..., T_text) integer frame counts (already rounded/clamped).
    """
    cum = jnp.cumsum(durations, axis=-1)
    start = cum - durations
    frames = jnp.arange(t_mel)
    aln = (frames >= start[..., None]) & (frames < cum[..., None])
    aln = aln.astype(jnp.float32)
    if text_mask is not None:
        aln = aln * text_mask[..., None]
    return aln


def duration_to_length(durations: jnp.ndarray) -> jnp.ndarray:
    """Total frames per sample."""
    return jnp.sum(durations, axis=-1)


def gaussian_alignment(
    duration_logits: jnp.ndarray,   # (B, T_text, max_dur) raw logits
    text_lengths: jnp.ndarray,      # (B,)
    t_mel: int,                     # static output frame capacity
    sigma: float = 1.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable alignment (B, T_text, t_mel) + predicted frame lengths.

    Follows ref Modules/slmadv.py:112-134 exactly, vectorized: with
    ``x = sigmoid(logits)``, ``dur = x.sum(-1)``, ``loc = cumsum(dur) - dur/2``,
    the grouped conv of logits with Gaussians reduces to
    ``out[i, t] = sum_k logits[i, k] * exp(-0.5 (t - k - 1 + loc_i)^2 / sig^2)``
    followed by a softmax over the text axis (masked to valid tokens).
    """
    b, t_text, max_dur = duration_logits.shape
    token_mask = jnp.arange(t_text)[None, :] < text_lengths[:, None]

    x = jax.nn.sigmoid(duration_logits) * token_mask[..., None]
    dur = x.sum(axis=-1)                                     # (B, T_text)
    lengths = jnp.round(dur.sum(axis=-1)).astype(jnp.int32)  # predicted frames
    loc = jnp.cumsum(dur, axis=-1) - dur / 2.0               # (B, T_text)

    t = jnp.arange(t_mel, dtype=jnp.float32)                 # (T,)
    k = jnp.arange(max_dur, dtype=jnp.float32)               # (K,)
    # Expanding the reference's grouped conv: kernel index j = k + L - 1 - t
    # must lie in [0, L), i.e. only k <= t contributes, with Gaussian argument
    # (k - t - 1 + loc_i).
    offset = k[None, None, :] - t[None, :, None] - 1.0       # (1, T, K)
    centers = offset[None] + loc[..., None, None]            # (B, T_text, T, K)
    gauss = jnp.exp(-0.5 * jnp.square(centers) / (sigma ** 2))
    gauss = gauss * (k[None, None, :] <= t[None, :, None])[None]
    out = jnp.einsum("bik,bitk->bit", duration_logits * token_mask[..., None], gauss)

    neg = jnp.finfo(out.dtype).min
    out = jnp.where(token_mask[:, :, None], out, neg)
    attn = jax.nn.softmax(out, axis=1)
    frame_mask = jnp.arange(t_mel)[None, :] < lengths[:, None]
    attn = attn * frame_mask[:, None, :] * token_mask[:, :, None]
    return attn, lengths
