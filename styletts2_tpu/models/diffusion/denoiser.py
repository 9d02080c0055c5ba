"""Style-diffusion denoiser transformers (ref: Modules/diffusion/modules.py).

``Transformer1d`` (single-speaker) and ``StyleTransformer1d`` (multispeaker,
AdaLayerNorm style conditioning) denoise a (B, 1, 2*style_dim) latent
conditioned on PL-BERT token embeddings, with additive time/feature "mapping"
conditioning at every block and mean pooling over the token axis.

Classifier-free guidance runs the conditional and fixed-embedding branches as
one doubled batch (one compiled forward instead of the reference's two calls,
ref: modules.py:418-423) — numerically identical, half the launch overhead.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ...nn.linear import linear
from ...nn.norm import ada_layer_norm, layer_norm
from .. import common as cm


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_attention(key, features: int, mid: int, style_dim: Optional[int]) -> Dict:
    ks = jax.random.split(key, 4)
    p: Dict = {
        "to_q": {"weight": cm.init_linear(ks[0], features, mid, bias=False)["weight"]},
        "to_kv": {"weight": cm.init_linear(ks[1], features, mid * 2, bias=False)["weight"]},
        "attention": {"to_out": cm.init_linear(ks[2], mid, features)},
    }
    if style_dim is None:
        p["norm"] = {"weight": jnp.ones((features,)), "bias": jnp.zeros((features,))}
        p["norm_context"] = {"weight": jnp.ones((features,)), "bias": jnp.zeros((features,))}
    else:
        p["norm"] = {"fc": cm.init_linear(ks[3], style_dim, features * 2)}
        p["norm_context"] = {"fc": cm.init_linear(jax.random.fold_in(ks[3], 1), style_dim, features * 2)}
    return p


def _init_block(key, features: int, mid: int, multiplier: int,
                style_dim: Optional[int]) -> Dict:
    ks = jax.random.split(key, 3)
    return {
        "attention": _init_attention(ks[0], features, mid, style_dim),
        "feed_forward": {
            "0": cm.init_linear(ks[1], features, features * multiplier),
            "2": cm.init_linear(ks[2], features * multiplier, features),
        },
    }


def init_denoiser(
    key,
    channels: int = 256,                  # style_dim * 2
    context_embedding_features: int = 768,
    num_layers: int = 3,
    num_heads: int = 8,
    head_features: int = 64,
    multiplier: int = 2,
    embedding_max_length: int = 512,
    style_dim: Optional[int] = None,      # set (=channels) for StyleTransformer1d
) -> Dict:
    features = channels + context_embedding_features
    mid = num_heads * head_features
    ks = jax.random.split(key, num_layers + 5)
    params: Dict = {"blocks": {}}
    for i in range(num_layers):
        params["blocks"][str(i)] = _init_block(ks[i], features, mid, multiplier, style_dim)
    params["to_out"] = {"1": cm.init_conv(ks[-5], features, channels, 1)}
    params["to_mapping"] = {
        "0": cm.init_linear(ks[-4], features, features),
        "2": cm.init_linear(ks[-3], features, features),
    }
    params["to_time"] = {
        "0": {
            "0": {"weights": jax.random.normal(jax.random.fold_in(ks[-2], 0), (channels // 2,))},
            "1": cm.init_linear(jax.random.fold_in(ks[-2], 1), channels + 1, features),
        }
    }
    if style_dim is not None:
        params["to_features"] = {"0": cm.init_linear(jax.random.fold_in(ks[-2], 2), style_dim, features)}
    params["fixed_embedding"] = {
        "embedding": cm.init_embedding(ks[-1], embedding_max_length, context_embedding_features)
    }
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _attention(p: Dict, x: jnp.ndarray, num_heads: int,
               style: Optional[jnp.ndarray] = None,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Self-attention with pre-norm (LayerNorm or AdaLayerNorm).

    ``mask`` (B, L) True=valid: padded *keys* are excluded so a bucketed
    padded batch reproduces the reference's exact-length batch-1 inference
    (the reference never pads at inference; see denoiser_apply)."""
    # norm (queries) and norm_context (keys/values) have separate parameters
    # even in self-attention (ref: modules.py:556-584).
    if style is None:
        h = layer_norm(x, p["norm"]["weight"], p["norm"]["bias"])
        ctx = layer_norm(x, p["norm_context"]["weight"], p["norm_context"]["bias"])
    else:
        h = ada_layer_norm(p["norm"], x, style)
        ctx = ada_layer_norm(p["norm_context"], x, style)

    q = h @ p["to_q"]["weight"].T
    kv = ctx @ p["to_kv"]["weight"].T
    k, v = jnp.split(kv, 2, axis=-1)

    b, n, _ = q.shape
    d = q.shape[-1] // num_heads

    def heads(t):
        return t.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (d ** -0.5)
    if mask is not None:
        sim = jnp.where(mask[:, None, None, :], sim, jnp.asarray(-1e9, sim.dtype))
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, num_heads * d)
    o = p["attention"]["to_out"]
    return linear(out, o["weight"], o["bias"])


def _feed_forward(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    h = _gelu(linear(x, p["0"]["weight"], p["0"]["bias"]))
    return linear(h, p["2"]["weight"], p["2"]["bias"])


def _time_embedding(p: Dict, t: jnp.ndarray) -> jnp.ndarray:
    """LearnedPositionalEmbedding -> Linear (ref: modules.py:657-678)."""
    w = p["0"]["weights"]                          # (channels // 2,)
    freqs = t[:, None] * w[None, :] * 2.0 * math.pi
    fourier = jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
    fourier = jnp.concatenate([t[:, None], fourier], axis=-1)
    return linear(fourier, p["1"]["weight"], p["1"]["bias"])


def denoiser_apply(
    params: Dict,
    x: jnp.ndarray,                  # (B, 1, channels) noisy latent
    time: jnp.ndarray,               # (B,) noise level embedding input
    embedding: jnp.ndarray,          # (B, L, context_embedding_features)
    features: Optional[jnp.ndarray] = None,   # (B, style_dim) multispeaker ref style
    num_heads: int = 8,
    style_conditioned: bool = False,
    mask: Optional[jnp.ndarray] = None,       # (B, L) True = valid token
) -> jnp.ndarray:
    """One denoiser forward, returns (B, 1, channels).

    The reference Transformer1d has no position masking: training feeds
    padded batches whose pad positions leak into attention and the mean
    pool (ref: modules.py:283-427) — the training step reproduces that by
    passing ``mask=None``.  Reference *inference* is exact-length batch-1
    (demo cell 17), so the bucketed-padded inference engine passes the
    token mask to get identical results at padded shapes: pad keys are
    excluded from attention and from the mean pool (valid rows are
    unaffected by pad rows, so this equals the exact-length computation).
    """
    x, time, embedding, features = cm.autocast(params, x, time, embedding, features)
    mapping = _gelu(_time_embedding(params["to_time"]["0"], time))
    if features is not None and "to_features" in params:
        f = params["to_features"]["0"]
        mapping = mapping + _gelu(linear(features, f["weight"], f["bias"]))
    m = params["to_mapping"]
    mapping = _gelu(linear(mapping, m["0"]["weight"], m["0"]["bias"]))
    mapping = _gelu(linear(mapping, m["2"]["weight"], m["2"]["bias"]))

    length = embedding.shape[1]
    h = jnp.concatenate(
        [jnp.broadcast_to(x, (x.shape[0], length, x.shape[2])), embedding], axis=-1
    )
    style = features if style_conditioned else None
    for i in range(len(params["blocks"])):
        blk = params["blocks"][str(i)]
        h = h + mapping[:, None, :]
        h = h + _attention(blk["attention"], h, num_heads, style, mask)
        h = h + _feed_forward(blk["feed_forward"], h)

    if mask is None:
        h = h.mean(axis=1)                           # (B, features)
    else:
        m = mask.astype(h.dtype)[..., None]
        h = (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
    out = params["to_out"]["1"]
    y = linear(h, out["weight"][:, :, 0], out["bias"])
    return y[:, None, :]


def fixed_embedding(params: Dict, batch: int, length: int) -> jnp.ndarray:
    """Positional fixed embedding used as the CFG 'unconditional' branch
    (ref: modules.py:680-712)."""
    table = params["fixed_embedding"]["embedding"]["weight"]
    emb = table[:length]
    if length > table.shape[0]:
        pad = jnp.broadcast_to(table[-1:], (length - table.shape[0], table.shape[1]))
        emb = jnp.concatenate([table, pad], axis=0)
    return jnp.broadcast_to(emb[None], (batch, length, table.shape[1]))


def denoiser_cfg_apply(
    params: Dict,
    x: jnp.ndarray,
    time: jnp.ndarray,
    embedding: jnp.ndarray,
    embedding_scale: float = 1.0,
    features: Optional[jnp.ndarray] = None,
    num_heads: int = 8,
    style_conditioned: bool = False,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Classifier-free-guided forward (ref: modules.py:402-427).

    ``embedding_scale == 1`` is a single pass; otherwise the conditional and
    fixed-embedding branches run as one doubled batch.
    """
    if embedding_scale == 1.0:
        return denoiser_apply(params, x, time, embedding, features,
                              num_heads, style_conditioned, mask)
    b = x.shape[0]
    fix = fixed_embedding(params, b, embedding.shape[1])
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([time, time], axis=0)
    e2 = jnp.concatenate([embedding, fix], axis=0)
    f2 = None if features is None else jnp.concatenate([features, features], axis=0)
    m2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    out = denoiser_apply(params, x2, t2, e2, f2, num_heads, style_conditioned, m2)
    cond, uncond = out[:b], out[b:]
    return uncond + (cond - uncond) * embedding_scale
