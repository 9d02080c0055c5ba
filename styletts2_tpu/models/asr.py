"""Auxiliary ASR text aligner (ref: Utils/ASR/models.py, Utils/ASR/layers.py).

Mel -> MFCC (DCT matmul) -> strided conv stem -> ``n_layers`` dilated-conv
encoder stages with GroupNorms -> projection.  Heads: CTC linear and the
attention seq2seq decoder (``ASRS2S``) whose location-sensitive attention
produces the text<->mel alignment (``s2s_attn``) consumed by training.

The reference's Python-level per-token decode loop
(ref: Utils/ASR/models.py:742-774) becomes a single ``lax.scan`` whose carry
is (h, c, attn, attn_cum, context); the location conv + energy projection run
inside the scan body on (B, L) slices.

Optional multi-task heads (intermediate/self-conditioned CTC, frame
classifier, speaker, pronunciation-error) are fork additions that default
off; the core heads plus the duration predictor cover every checkpoint the
reference training path loads.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import init as jinit
from ..nn.conv import conv1d
from ..nn.linear import linear
from ..nn.lstm import lstm_step
from . import common as cm


@dataclasses.dataclass(frozen=True)
class ASRConfig:
    input_dim: int = 80
    hidden_dim: int = 256
    n_token: int = 178
    n_layers: int = 5
    token_embedding_dim: int = 512
    location_kernel_size: int = 31
    n_mfcc: int = 40
    n_location_filters: int = 32
    sos: int = 1
    unk_index: int = 3
    random_mask: float = 0.1
    # Optional fork-added multi-task heads (ref: Utils/ASR/models.py:49-134,
    # 202-327); all default off, matching the shipped checkpoints.
    intermediate_ctc_layers: tuple = ()
    self_conditioned_layers: tuple = ()
    enable_frame_classifier: bool = False
    frame_num_classes: int = 0
    enable_speaker: bool = False
    num_speakers: int = 0
    speaker_embedding_dim: int = 0
    enable_pron_error: bool = False
    pron_error_classes: int = 2
    # Sample-wise stochastic depth on encoder stages (ref: models.py:12-46)
    stochastic_depth_rate: float = 0.0
    # Rematerialize encoder stages in the backward pass
    # (ref: Utils/ASR/models.py:384-422 checkpoint_sequential)
    gradient_checkpointing: bool = False


@functools.lru_cache(maxsize=None)
def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """torchaudio ``create_dct(n_mfcc, n_mels, 'ortho')`` -> (n_mels, n_mfcc)."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    dct = np.cos(np.pi / n_mels * (n[None, :] + 0.5) * k)    # (n_mfcc, n_mels)
    dct *= np.sqrt(2.0 / n_mels)
    dct[0] *= 1.0 / np.sqrt(2.0)
    return dct.T.astype(np.float32)


def _group_norm(x: jnp.ndarray, groups: int, gamma: jnp.ndarray, beta: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm on (B, C, T): normalize over (C/groups, T) per group."""
    b, c, t = x.shape
    xg = x.reshape(b, groups, c // groups, t)
    mean = xg.mean(axis=(2, 3), keepdims=True)
    var = xg.var(axis=(2, 3), keepdims=True)
    xg = (xg - mean) / jnp.sqrt(var + eps)
    return xg.reshape(b, c, t) * gamma[None, :, None] + beta[None, :, None]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_conv_norm(key, in_ch, out_ch, kernel=1, gain: float = 1.0) -> Dict:
    """ConvNorm: xavier_uniform conv (ref: Utils/ASR/layers.py:37-55)."""
    return {"conv": cm.init_conv(
        key, in_ch, out_ch, kernel,
        w_init=lambda k, s: jinit.xavier_uniform(k, s, gain))}


def _init_linear_norm(key, in_f, out_f, bias=True, gain: float = 1.0) -> Dict:
    return {"linear_layer": cm.init_linear(
        key, in_f, out_f, bias,
        w_init=lambda k, s: jinit.xavier_uniform(k, s, gain))}


def _init_conv_block(key, hidden: int, n_conv: int = 3) -> Dict:
    blocks = {}
    for i in range(n_conv):
        k1, k2, key = jax.random.split(key, 3)
        blocks[str(i)] = {
            "0": _init_conv_norm(k1, hidden, hidden, 3),
            "2": {"weight": jnp.ones((hidden,)), "bias": jnp.zeros((hidden,))},
            "4": _init_conv_norm(k2, hidden, hidden, 3),
        }
    return {"blocks": blocks}


def init_asr(key, cfg: ASRConfig = ASRConfig()) -> Dict:
    h = cfg.hidden_dim
    ks = jax.random.split(key, cfg.n_layers + 20)
    ki = iter(range(len(ks)))
    params: Dict = {
        "init_cnn": _init_conv_norm(ks[next(ki)], cfg.n_mfcc, h, 7),
        "encoder_layers": {},
        "projection": _init_conv_norm(ks[next(ki)], h, h // 2),
        "ctc_linear": {
            "0": _init_linear_norm(ks[next(ki)], h // 2, h),
            "2": _init_linear_norm(ks[next(ki)], h, cfg.n_token),
        },
        "duration_predictor": {
            "0": cm.init_embedding(ks[next(ki)], cfg.n_token, max(4, h // 16)),
            "2": cm.init_linear(ks[next(ki)], max(4, h // 16), 1),
        },
    }
    for i in range(cfg.n_layers):
        params["encoder_layers"][str(i)] = {
            "block": _init_conv_block(ks[next(ki)], h),
            "post_norm": {"weight": jnp.ones((h,)), "bias": jnp.zeros((h,))},
        }

    # optional multi-task heads (ref: Utils/ASR/models.py:202-327)
    if cfg.intermediate_ctc_layers:
        params["intermediate_ctc_heads"] = {}
        proj = max(1, h // 2)
        for li in cfg.intermediate_ctc_layers:
            k = jax.random.fold_in(key, 300 + li)
            params["intermediate_ctc_heads"][str(li)] = {"layers": {
                "0": _init_conv_norm(jax.random.fold_in(k, 0), h, proj),
                "3": _init_conv_norm(jax.random.fold_in(k, 1), proj, cfg.n_token),
            }}
    if cfg.self_conditioned_layers:
        params["self_conditioning_blocks"] = {}
        proj = max(1, h // 2)
        for li in cfg.self_conditioned_layers:
            k = jax.random.fold_in(key, 400 + li)
            params["self_conditioning_blocks"][str(li)] = {
                "predictor": {
                    "0": _init_conv_norm(jax.random.fold_in(k, 0), h, h),
                    "3": _init_conv_norm(jax.random.fold_in(k, 1), h, proj),
                    "6": _init_conv_norm(jax.random.fold_in(k, 2), proj, cfg.n_token),
                },
                "condition_projector": {
                    "1": _init_conv_norm(jax.random.fold_in(k, 3), cfg.n_token, h),
                },
            }
    if cfg.enable_frame_classifier:
        n_cls = cfg.frame_num_classes or cfg.n_token
        k = jax.random.fold_in(key, 500)
        params["frame_classifier"] = {
            "0": _init_linear_norm(jax.random.fold_in(k, 0), h // 2, h // 2),
            "2": _init_linear_norm(jax.random.fold_in(k, 1), h // 2, n_cls),
        }
    if cfg.enable_speaker:
        emb_dim = cfg.speaker_embedding_dim or h // 2
        k = jax.random.fold_in(key, 600)
        params["speaker_projection"] = cm.init_linear(jax.random.fold_in(k, 0), h // 2, emb_dim)
        params["speaker_norm"] = {"weight": jnp.ones((emb_dim,)), "bias": jnp.zeros((emb_dim,))}
        params["speaker_classifier"] = cm.init_linear(
            jax.random.fold_in(k, 1), emb_dim, max(1, cfg.num_speakers))
    if cfg.enable_pron_error:
        k = jax.random.fold_in(key, 700)
        params["pron_error_head"] = {
            "0": _init_linear_norm(jax.random.fold_in(k, 0), h // 2, h // 2),
            "2": _init_linear_norm(jax.random.fold_in(k, 1), h // 2,
                                   max(2, cfg.pron_error_classes)),
        }
    d = h // 2
    tanh_gain = 5.0 / 3.0
    emb_range = math.sqrt(6.0 / d)
    params["asr_s2s"] = {
        "embedding": {"weight": jax.random.uniform(
            ks[next(ki)], (cfg.n_token, cfg.token_embedding_dim),
            minval=-emb_range, maxval=emb_range)},
        "project_to_n_symbols": cm.init_linear(ks[next(ki)], d, cfg.n_token),
        "attention_layer": {
            "query_layer": _init_linear_norm(ks[next(ki)], d, d, bias=False, gain=tanh_gain),
            "memory_layer": _init_linear_norm(jax.random.fold_in(ks[next(ki)], 0), d, d,
                                              bias=False, gain=tanh_gain),
            "v": _init_linear_norm(jax.random.fold_in(ks[next(ki)], 1), d, 1, bias=False),
            "location_layer": {
                "location_conv": _init_conv_norm(
                    jax.random.fold_in(ks[next(ki)], 2), 2, cfg.n_location_filters,
                    cfg.location_kernel_size),
                "location_dense": _init_linear_norm(
                    jax.random.fold_in(ks[next(ki)], 3), cfg.n_location_filters, d,
                    bias=False, gain=tanh_gain),
            },
        },
        "project_to_hidden": {"0": _init_linear_norm(
            jax.random.fold_in(ks[next(ki)], 5), d * 2, d)},
    }
    # torch LSTMCell params (no layer suffix)
    kc = jax.random.fold_in(key, 999)
    bound = 1.0 / math.sqrt(d)
    params["asr_s2s"]["decoder_rnn"] = {
        "weight_ih": jax.random.uniform(jax.random.fold_in(kc, 0),
                                        (4 * d, d + cfg.token_embedding_dim),
                                        minval=-bound, maxval=bound),
        "weight_hh": jax.random.uniform(jax.random.fold_in(kc, 1), (4 * d, d),
                                        minval=-bound, maxval=bound),
        "bias_ih": jax.random.uniform(jax.random.fold_in(kc, 2), (4 * d,),
                                      minval=-bound, maxval=bound),
        "bias_hh": jax.random.uniform(jax.random.fold_in(kc, 3), (4 * d,),
                                      minval=-bound, maxval=bound),
    }
    # ConvNorm location conv has no bias in the reference
    params["asr_s2s"]["attention_layer"]["location_layer"]["location_conv"]["conv"].pop("bias", None)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _conv_norm(p: Dict, x, **kw):
    return conv1d(x, p["conv"]["weight"], p["conv"].get("bias"), **kw)


def _conv_block(p: Dict, x: jnp.ndarray, train: bool, rng, dropout_p: float = 0.2) -> jnp.ndarray:
    for i in range(len(p["blocks"])):
        blk = p["blocks"][str(i)]
        dil = 3 ** i
        res = x
        h = _conv_norm(blk["0"], x, padding=dil, dilation=dil)
        h = jax.nn.relu(h)
        h = _group_norm(h, 8, blk["2"]["weight"], blk["2"]["bias"])
        h = cm.dropout(h, dropout_p, train, jax.random.fold_in(rng, 2 * i) if rng is not None else None)
        h = _conv_norm(blk["4"], h, padding=1)
        h = jax.nn.relu(h)
        h = cm.dropout(h, dropout_p, train, jax.random.fold_in(rng, 2 * i + 1) if rng is not None else None)
        x = h + res
    return x


def asr_encode(params: Dict, mels: jnp.ndarray, cfg: ASRConfig = ASRConfig(),
               train: bool = False, rng=None, aux: Optional[Dict] = None) -> jnp.ndarray:
    """Mel (B, 80, T) -> encoder features (B, T//2, hidden//2).

    When enabled in ``cfg``, intermediate-CTC and self-conditioned-CTC blocks
    tap/condition the encoder between stages and their logits are written
    into ``aux`` (ref: Utils/ASR/models.py:424-458).
    """
    mels = cm.autocast(params, mels)  # fp32-pinned mel -> encoder dtype
    dct = jnp.asarray(_dct_matrix(cfg.n_mfcc, cfg.input_dim), dtype=mels.dtype)
    mfcc = jnp.swapaxes(jnp.swapaxes(mels, 1, 2) @ dct, 1, 2)   # (B, 40, T)
    x = _conv_norm(params["init_cnn"], mfcc, stride=2, padding=3)
    n = cfg.n_layers
    for i in range(n):
        layer = params["encoder_layers"][str(i)]
        r = jax.random.fold_in(rng, 100 + i) if rng is not None else None

        def stage(lp, xx):
            yy = _conv_block(lp["block"], xx, train, r)
            return _group_norm(yy, 1, lp["post_norm"]["weight"],
                               lp["post_norm"]["bias"])

        if cfg.gradient_checkpointing and train:
            stage = jax.checkpoint(stage)
        y = stage(layer, x)
        if cfg.stochastic_depth_rate > 0 and train and rng is not None:
            # linear per-layer schedule, sample-wise (ref: models.py:12-46, 329-343)
            drop = cfg.stochastic_depth_rate * ((i) / max(1, n - 1))
            keep = 1.0 - drop
            gate = jax.random.bernoulli(jax.random.fold_in(rng, 200 + i),
                                        keep, (x.shape[0], 1, 1))
            y = x + (y - x) / keep * gate
        x = y
        layer_idx = i + 1
        if aux is not None and str(layer_idx) in params.get("intermediate_ctc_heads", {}):
            head = params["intermediate_ctc_heads"][str(layer_idx)]["layers"]
            hmid = jax.nn.gelu(_conv_norm(head["0"], x), approximate=False)
            logits = _conv_norm(head["3"], hmid)
            aux.setdefault("intermediate_ctc_logits", {})[str(layer_idx)] = \
                jnp.swapaxes(logits, 1, 2)
        if str(layer_idx) in params.get("self_conditioning_blocks", {}):
            blk = params["self_conditioning_blocks"][str(layer_idx)]
            p1 = jax.nn.gelu(_conv_norm(blk["predictor"]["0"], x), approximate=False)
            p2 = jax.nn.gelu(_conv_norm(blk["predictor"]["3"], p1), approximate=False)
            logits = _conv_norm(blk["predictor"]["6"], p2)
            log_probs = jax.nn.log_softmax(logits, axis=1)
            cond = _conv_norm(blk["condition_projector"]["1"],
                              jax.lax.stop_gradient(jnp.exp(log_probs)))
            x = x + cond
            if aux is not None:
                aux.setdefault("self_conditioned_ctc_logits", {})[str(layer_idx)] = \
                    jnp.swapaxes(logits, 1, 2)
    x = _conv_norm(params["projection"], x)
    return jnp.swapaxes(x, 1, 2)


def asr_s2s_apply(
    params: Dict,
    memory: jnp.ndarray,            # (B, L, d)
    memory_pad_mask: jnp.ndarray,   # (B, L) True at padding
    text: jnp.ndarray,              # (B, T) token ids
    cfg: ASRConfig = ASRConfig(),
    train: bool = False,
    rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scanned seq2seq decode (ref: Utils/ASR/models.py:742-803).

    Returns (hidden (B,T+1,d), logits (B,T+1,n_token), attn (B,T+1,L)).
    """
    p = params["asr_s2s"]
    att = p["attention_layer"]
    b, length, d = memory.shape

    if train and rng is not None and cfg.random_mask > 0:
        mask = jax.random.uniform(jax.random.fold_in(rng, 7), text.shape) < cfg.random_mask
        text = jnp.where(mask, cfg.unk_index, text)

    emb = cm.embedding(p["embedding"], text)                        # (B, T, E)
    sos = jnp.broadcast_to(p["embedding"]["weight"][cfg.sos], (b, 1, emb.shape[-1]))
    dec_inputs = jnp.concatenate([sos, emb], axis=1)                # (B, T+1, E)

    processed_memory = memory @ att["memory_layer"]["linear_layer"]["weight"].T
    loc_w = att["location_layer"]["location_conv"]["conv"]["weight"]
    loc_dense_w = att["location_layer"]["location_dense"]["linear_layer"]["weight"]
    query_w = att["query_layer"]["linear_layer"]["weight"]
    v_w = att["v"]["linear_layer"]["weight"]
    neg_inf = jnp.finfo(memory.dtype).min

    def step(carry, inp):
        h, c, attn_w, attn_cum, context = carry
        dec_in, key_t = inp
        cell_in = jnp.concatenate([dec_in, context], axis=-1)
        h, c = lstm_step(p["decoder_rnn"], cell_in, h, c)

        weights_cat = jnp.stack([attn_w, attn_cum], axis=1)         # (B, 2, L)
        loc = conv1d(weights_cat, loc_w, padding=(cfg.location_kernel_size - 1) // 2)
        loc = jnp.swapaxes(loc, 1, 2) @ loc_dense_w.T               # (B, L, d)
        q = (h @ query_w.T)[:, None, :]
        energies = (jnp.tanh(q + loc + processed_memory) @ v_w.T)[..., 0]
        energies = jnp.where(memory_pad_mask, neg_inf, energies)
        attn_w = jax.nn.softmax(energies, axis=1)
        context = jnp.einsum("bl,bld->bd", attn_w, memory)
        attn_cum = attn_cum + attn_w

        hc = jnp.concatenate([h, context], axis=-1)
        hid = jnp.tanh(linear(hc, p["project_to_hidden"]["0"]["linear_layer"]["weight"],
                              p["project_to_hidden"]["0"]["linear_layer"]["bias"]))
        hid_do = cm.dropout(hid, 0.5, train, key_t if train else None)
        logit = linear(hid_do, p["project_to_n_symbols"]["weight"],
                       p["project_to_n_symbols"]["bias"])
        return (h, c, attn_w, attn_cum, context), (hid, logit, attn_w)

    t_steps = dec_inputs.shape[1]
    init = (
        jnp.zeros((b, d), memory.dtype), jnp.zeros((b, d), memory.dtype),
        jnp.zeros((b, length), memory.dtype), jnp.zeros((b, length), memory.dtype),
        jnp.zeros((b, d), memory.dtype),
    )
    keys = jax.random.split(jax.random.fold_in(rng, 8), t_steps) if rng is not None \
        else jnp.zeros((t_steps, 2), jnp.uint32)
    xs = (jnp.swapaxes(dec_inputs, 0, 1), keys)
    _, (hidden, logits, attn) = jax.lax.scan(step, init, xs, unroll=2)
    return (jnp.swapaxes(hidden, 0, 1), jnp.swapaxes(logits, 0, 1),
            jnp.swapaxes(attn, 0, 1))


def asr_apply(
    params: Dict,
    mels: jnp.ndarray,              # (B, 80, T)
    memory_pad_mask: jnp.ndarray,   # (B, T//2) True at padding
    text: jnp.ndarray,              # (B, T_text)
    cfg: ASRConfig = ASRConfig(),
    train: bool = False,
    rng=None,
) -> Dict[str, jnp.ndarray]:
    """Full aligner forward (ref: Utils/ASR/models.py:377-535); returns the
    dict keys the training drivers consume (ctc_logits, s2s_logits, s2s_attn)
    plus any enabled multi-task head outputs."""
    out: Dict[str, jnp.ndarray] = {}
    memory = asr_encode(params, mels, cfg, train, rng, aux=out)
    cl = params["ctc_linear"]
    h = jax.nn.relu(linear(memory, cl["0"]["linear_layer"]["weight"],
                           cl["0"]["linear_layer"]["bias"]))
    ctc_logits = linear(h, cl["2"]["linear_layer"]["weight"],
                        cl["2"]["linear_layer"]["bias"])
    hidden, s2s_logits, s2s_attn = asr_s2s_apply(
        params, memory, memory_pad_mask, text, cfg, train, rng)
    out.update({
        "ctc_logits": ctc_logits,
        "encoder_features": memory,
        "s2s_hidden": hidden,
        "s2s_logits": s2s_logits,
        "s2s_attn": s2s_attn,
    })
    if cfg.enable_frame_classifier and "frame_classifier" in params:
        fc = params["frame_classifier"]
        fh = jax.nn.relu(linear(memory, fc["0"]["linear_layer"]["weight"],
                                fc["0"]["linear_layer"]["bias"]))
        out["frame_phoneme_logits"] = linear(fh, fc["2"]["linear_layer"]["weight"],
                                             fc["2"]["linear_layer"]["bias"])
    if cfg.enable_speaker and "speaker_projection" in params:
        pooled = memory.mean(axis=1)
        emb = jnp.tanh(linear(pooled, params["speaker_projection"]["weight"],
                              params["speaker_projection"]["bias"]))
        from ..nn.norm import layer_norm
        emb = layer_norm(emb, params["speaker_norm"]["weight"],
                         params["speaker_norm"]["bias"])
        out["speaker_embeddings"] = emb
        out["speaker_logits"] = linear(emb, params["speaker_classifier"]["weight"],
                                       params["speaker_classifier"]["bias"])
    if cfg.enable_pron_error and "pron_error_head" in params:
        ph = params["pron_error_head"]
        # drop the SOS step (ref: Utils/ASR/models.py:518-525)
        pron_in = hidden[:, 1:, :] if hidden.shape[1] > 1 else hidden
        hmid = jax.nn.relu(linear(pron_in, ph["0"]["linear_layer"]["weight"],
                                  ph["0"]["linear_layer"]["bias"]))
        out["pron_error_logits"] = linear(hmid, ph["2"]["linear_layer"]["weight"],
                                          ph["2"]["linear_layer"]["bias"])
    if "duration_predictor" in params:
        dp = params["duration_predictor"]
        emb = cm.embedding(dp["0"], text)
        dh = jax.nn.relu(emb)
        out["duration_predictions"] = jax.nn.softplus(
            linear(dh, dp["2"]["weight"], dp["2"]["bias"]))
    return out
