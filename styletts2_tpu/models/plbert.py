"""PL-BERT: phoneme-level ALBERT encoder (ref: Utils/PLBERT/util.py:22-142).

A from-scratch JAX ALBERT (shared-layer transformer, factorized embeddings)
matching HF ``AlbertModel`` numerics: gelu_new activations, layer-norm eps
1e-12, additive attention masking.  Only ``last_hidden_state`` is produced
(the reference strips the pooler).

Position-embedding capacity follows the reference's runtime-resize rule
(ref: Utils/PLBERT/util.py:8-20, 31-65): tables grow to >= 1024 positions by
repeating the last learned row.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.linear import linear
from ..nn.norm import layer_norm
from . import common as cm


@dataclasses.dataclass(frozen=True)
class PLBertConfig:
    vocab_size: int = 178
    embedding_size: int = 128
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 2048
    max_position_embeddings: int = 512
    num_hidden_layers: int = 12
    layer_norm_eps: float = 1e-12
    dropout: float = 0.1


def init_plbert(key, cfg: PLBertConfig = PLBertConfig()) -> Dict:
    ks = jax.random.split(key, 16)
    e = cfg.embedding_size
    h = cfg.hidden_size

    def emb(k, n, d):
        # HF init: normal(0, 0.02)
        return {"weight": 0.02 * jax.random.normal(k, (n, d))}

    def lin(k, i, o):
        kw, kb = jax.random.split(k)
        return {"weight": 0.02 * jax.random.normal(kw, (o, i)), "bias": jnp.zeros((o,))}

    layer = {
        "attention": {
            "query": lin(ks[4], h, h),
            "key": lin(ks[5], h, h),
            "value": lin(ks[6], h, h),
            "dense": lin(ks[7], h, h),
            "LayerNorm": {"weight": jnp.ones((h,)), "bias": jnp.zeros((h,))},
        },
        "ffn": lin(ks[8], h, cfg.intermediate_size),
        "ffn_output": lin(ks[9], cfg.intermediate_size, h),
        "full_layer_layer_norm": {"weight": jnp.ones((h,)), "bias": jnp.zeros((h,))},
    }
    return {
        "embeddings": {
            "word_embeddings": emb(ks[0], cfg.vocab_size, e),
            "position_embeddings": emb(ks[1], cfg.max_position_embeddings, e),
            "token_type_embeddings": emb(ks[2], 2, e),
            "LayerNorm": {"weight": jnp.ones((e,)), "bias": jnp.zeros((e,))},
        },
        "encoder": {
            "embedding_hidden_mapping_in": lin(ks[3], e, h),
            "albert_layer_groups": {"0": {"albert_layers": {"0": layer}}},
        },
    }


def resize_position_embeddings(params: Dict, target: int) -> Dict:
    """Grow the position table by repeating the last row
    (ref: Utils/PLBERT/util.py:31-65)."""
    table = params["embeddings"]["position_embeddings"]["weight"]
    cur = table.shape[0]
    if target <= cur:
        return params
    pad = jnp.broadcast_to(table[-1:], (target - cur, table.shape[1]))
    new = jnp.concatenate([table, pad], axis=0)
    out = jax.tree_util.tree_map(lambda x: x, params)
    out["embeddings"] = dict(params["embeddings"])
    out["embeddings"]["position_embeddings"] = {"weight": new}
    return out


def plbert_apply(
    params: Dict,
    input_ids: jnp.ndarray,                   # (B, L) int
    attention_mask: Optional[jnp.ndarray] = None,  # (B, L) 1 = keep
    cfg: PLBertConfig = PLBertConfig(),
) -> jnp.ndarray:
    """Returns last_hidden_state (B, L, hidden_size)."""
    b, length = input_ids.shape
    emb = params["embeddings"]
    x = cm.embedding(emb["word_embeddings"], input_ids)
    pos = emb["position_embeddings"]["weight"][:length]
    x = x + pos[None] + emb["token_type_embeddings"]["weight"][0][None, None, :]
    x = layer_norm(x, emb["LayerNorm"]["weight"], emb["LayerNorm"]["bias"],
                   eps=cfg.layer_norm_eps)

    m = params["encoder"]["embedding_hidden_mapping_in"]
    h = linear(x, m["weight"], m["bias"])

    if attention_mask is None:
        bias = None
    else:
        bias = (1.0 - attention_mask.astype(h.dtype))[:, None, None, :] * jnp.finfo(h.dtype).min

    layer = params["encoder"]["albert_layer_groups"]["0"]["albert_layers"]["0"]

    # ALBERT shares ONE layer's weights across all 12 applications, so the
    # repeat is a lax.scan with no stacked params: identical math, 12x less
    # HLO than the unrolled loop (the stage-2 step compiles this subgraph
    # twice, fwd+bwd — part of the round-4 452 s step-compile problem).
    def body(h, _):
        return _albert_layer(layer, h, bias, cfg), None

    h, _ = jax.lax.scan(body, h, None, length=cfg.num_hidden_layers)
    return h


def _albert_layer(p: Dict, h: jnp.ndarray, bias, cfg: PLBertConfig) -> jnp.ndarray:
    att = p["attention"]
    b, l, hid = h.shape
    n_heads = cfg.num_attention_heads
    d = hid // n_heads

    def heads(t):
        return t.reshape(b, l, n_heads, d).transpose(0, 2, 1, 3)

    q = heads(linear(h, att["query"]["weight"], att["query"]["bias"]))
    k = heads(linear(h, att["key"]["weight"], att["key"]["bias"]))
    v = heads(linear(h, att["value"]["weight"], att["value"]["bias"]))

    scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / math.sqrt(d)
    if bias is not None:
        scores = scores + bias
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhlm,bhmd->bhld", attn, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, hid)
    ctx = linear(ctx, att["dense"]["weight"], att["dense"]["bias"])
    h = layer_norm(h + ctx, att["LayerNorm"]["weight"], att["LayerNorm"]["bias"],
                   eps=cfg.layer_norm_eps)

    f = jax.nn.gelu(linear(h, p["ffn"]["weight"], p["ffn"]["bias"]), approximate=True)
    f = linear(f, p["ffn_output"]["weight"], p["ffn_output"]["bias"])
    return layer_norm(h + f, p["full_layer_layer_norm"]["weight"],
                      p["full_layer_layer_norm"]["bias"], eps=cfg.layer_norm_eps)
