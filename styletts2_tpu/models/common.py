"""Shared building blocks for the model zoo.

Conventions used by every model module in this package:

- Parameters are nested dicts of jnp arrays whose flattened dot-joined keys
  equal the reference torch ``state_dict`` keys (sequential indices become
  string keys), making checkpoint conversion a pure re-nesting operation.
- ``init_*`` functions build freshly initialized params with torch-default
  distributions; ``*_apply`` functions are pure and jittable.
- Dropout takes an explicit PRNG key and a ``train`` flag; keys are derived
  with ``jax.random.fold_in`` on static per-site integers.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn import init as jinit
from ..nn.conv import conv1d, conv2d, conv2d_nhwc
from ..nn.param_norm import spectral_norm_kernel, weight_norm_kernel


# ---------------------------------------------------------------------------
# Parameter constructors
# ---------------------------------------------------------------------------

def init_linear(key, in_f: int, out_f: int, bias: bool = True,
                w_init=None) -> Dict:
    kw, kb = jax.random.split(key)
    shape = (out_f, in_f)
    w = (w_init or jinit.kaiming_uniform)(kw, shape)
    p = {"weight": w}
    if bias:
        p["bias"] = jinit.conv_bias(kb, (out_f,), shape)
    return p


def init_conv(key, in_ch: int, out_ch: int, kernel, groups: int = 1,
              bias: bool = True, w_init=None) -> Dict:
    """Plain conv params (1d kernel int, 2d kernel tuple)."""
    kshape = (kernel,) if isinstance(kernel, int) else tuple(kernel)
    shape = (out_ch, in_ch // groups, *kshape)
    kw, kb = jax.random.split(key)
    w = (w_init or jinit.kaiming_uniform)(kw, shape)
    p = {"weight": w}
    if bias:
        p["bias"] = jinit.conv_bias(kb, (out_ch,), shape)
    return p


def init_conv_transpose(key, in_ch: int, out_ch: int, kernel: int,
                        groups: int = 1, bias: bool = True) -> Dict:
    shape = (in_ch, out_ch // groups, kernel)
    kw, kb = jax.random.split(key)
    # torch ConvTranspose uses kaiming_uniform with fan_in = out_ch/groups * k
    w = jinit.kaiming_uniform(kw, shape)
    p = {"weight": w}
    if bias:
        p["bias"] = jinit.conv_bias(kb, (out_ch,), shape)
    return p


def _to_weight_norm(p: Dict) -> Dict:
    """Split a plain ``weight`` into torch weight-norm (v, g) parameters."""
    w = p.pop("weight")
    axes = tuple(range(1, w.ndim))
    norm = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
    p["weight_v"] = w
    p["weight_g"] = norm
    return p


def init_wn_conv(key, in_ch, out_ch, kernel, groups: int = 1, bias: bool = True,
                 w_init=None) -> Dict:
    return _to_weight_norm(init_conv(key, in_ch, out_ch, kernel, groups, bias, w_init))


def init_wn_conv_transpose(key, in_ch, out_ch, kernel, groups: int = 1,
                           bias: bool = True) -> Dict:
    return _to_weight_norm(init_conv_transpose(key, in_ch, out_ch, kernel, groups, bias))


def init_wn_linear(key, in_f, out_f, bias: bool = True) -> Dict:
    return _to_weight_norm(init_linear(key, in_f, out_f, bias))


def init_sn_conv(key, in_ch, out_ch, kernel, groups: int = 1, bias: bool = True) -> Dict:
    """Spectral-norm conv params with torch buffer names.

    The (u, v) power-iteration vectors are converged at init: random vectors
    give a wildly wrong sigma estimate (possibly ~0), which blows up the
    forward; torch avoids this by updating the buffers every training
    forward.  Converged buffers also make eval-mode sigma correct.
    """
    p = init_conv(key, in_ch, out_ch, kernel, groups, bias)
    w = p.pop("weight")
    ku = jax.random.fold_in(key, 7)
    u = jax.random.normal(ku, (w.shape[0],))
    u = u / jnp.linalg.norm(u)
    w_mat = w.reshape(w.shape[0], -1)
    v = jnp.ones((w_mat.shape[1],)) / jnp.sqrt(w_mat.shape[1])
    for _ in range(15):
        v = w_mat.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u = w_mat @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    p["weight_orig"] = w
    p["weight_u"] = u
    p["weight_v"] = v
    return p


def init_lstm(key, input_size: int, hidden: int, bidirectional: bool = True,
              layer: str = "l0") -> Dict:
    """torch nn.LSTM params: U(-1/sqrt(H), 1/sqrt(H)) everywhere."""
    names = [f"weight_ih_{layer}", f"weight_hh_{layer}", f"bias_ih_{layer}", f"bias_hh_{layer}"]
    if bidirectional:
        names += [n + "_reverse" for n in names[:4]]
    shapes = {
        "weight_ih": (4 * hidden, input_size),
        "weight_hh": (4 * hidden, hidden),
        "bias_ih": (4 * hidden,),
        "bias_hh": (4 * hidden,),
    }
    p = {}
    for i, name in enumerate(names):
        base = name.replace("_reverse", "").rsplit("_", 1)[0]
        p[name] = jinit.uniform_sqrt_hidden(jax.random.fold_in(key, i), shapes[base], hidden)
    return p


def init_embedding(key, num: int, dim: int) -> Dict:
    return {"weight": jinit.normal(key, (num, dim))}


# ---------------------------------------------------------------------------
# Apply helpers
# ---------------------------------------------------------------------------

def wn_conv1d(p: Dict, x, **kw):
    return conv1d(x, weight_norm_kernel(p), p.get("bias"), **kw)


def wn_conv2d(p: Dict, x, **kw):
    return conv2d(x, weight_norm_kernel(p), p.get("bias"), **kw)


def wn_conv2d_nhwc(p: Dict, x, **kw):
    return conv2d_nhwc(x, weight_norm_kernel(p), p.get("bias"), **kw)


def wn_conv1d_from2d(p: Dict, x, **kw):
    """Apply a torch Conv2d with a (K, 1) kernel as a conv1d.

    Checkpoint layout stays (out, in, K, 1); squeezing the unit width is
    exact because such a kernel never mixes the W axis (MPD towers)."""
    return conv1d(x, weight_norm_kernel(p)[..., 0], p.get("bias"), **kw)


def _sn_kernel(p: Dict) -> jnp.ndarray:
    """Effective spectral-norm kernel with one stateless power iteration.

    torch updates the stored (u, v) buffers every training forward; we
    re-derive one refinement step from the stored buffers under
    stop_gradient — identical gradients (torch treats u, v as constants) and,
    for converged buffers (init or loaded checkpoints), a near-identical
    sigma to torch's eval path.
    """
    frozen = {
        "weight_orig": p["weight_orig"],
        "weight_u": jax.lax.stop_gradient(p["weight_u"]),
        "weight_v": jax.lax.stop_gradient(p["weight_v"]),
    }
    w, _ = spectral_norm_kernel(frozen, n_power_iterations=1)
    return w


def sn_conv2d(p: Dict, x, **kw):
    return conv2d(x, _sn_kernel(p), p.get("bias"), **kw)


def sn_conv1d(p: Dict, x, **kw):
    return conv1d(x, _sn_kernel(p), p.get("bias"), **kw)


def embedding(p: Dict, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["weight"], ids, axis=0)


def dropout(x: jnp.ndarray, p: float, train: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    if not train or p <= 0.0 or rng is None:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def jinit_hifigan(key, shape):
    """HiFi-GAN conv init N(0, 0.01) (ref: Modules/utils.py init_weights)."""
    return jinit.hifigan_conv(key, shape)


def length_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Padding mask, True at padded positions (ref: utils.py:39-42)."""
    return jnp.arange(max_len)[None, :] + 1 > lengths[:, None]


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def param_dtype(params) -> Optional[jnp.dtype]:
    """Floating dtype of a module's parameters (None if there are none)."""
    for leaf in jax.tree_util.tree_leaves(params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return None


def autocast(params, *xs):
    """Cast activations entering a module to the module's parameter dtype.

    The torch reference runs modules under ``accelerator.autocast`` so fp32
    features (mel/STFT/F0 extractors are fp32-pinned for numerics) compute in
    bf16 inside bf16 modules.  Without this the first conv promotes to fp32
    and poisons the whole downstream tower — bf16 then saves no HBM at all.
    A no-op when dtypes already agree (fp32 training/tests).
    """
    dt = param_dtype(params)

    def cast(a):
        if a is None or dt is None:
            return a
        if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype != dt:
            return a.astype(dt)
        return a

    out = tuple(cast(a) for a in xs)
    return out if len(out) > 1 else out[0]
