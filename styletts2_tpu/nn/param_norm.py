"""Weight and spectral reparameterizations (torch-compatible).

The reference wraps almost every conv in ``torch.nn.utils.weight_norm`` and
the style-encoder convs in ``spectral_norm``.  We keep the same parameter
split (``weight_v``/``weight_g``, ``weight_orig``/``weight_u``) so state
dicts convert key-for-key, and compute the effective kernel inside the jitted
forward — XLA folds it into the conv at compile time for inference.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp


def weight_norm_kernel(params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Effective kernel of a weight-normed conv/linear.

    torch stores ``weight_g`` (out, 1, ...) and ``weight_v`` (full shape);
    ``w = g * v / ||v||`` with the norm over all axes except dim 0.
    """
    v = params["weight_v"]
    g = params["weight_g"]
    axes = tuple(range(1, v.ndim))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm


def spectral_norm_kernel(
    params: Dict[str, jnp.ndarray],
    n_power_iterations: int = 0,
    eps: float = 1e-12,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Effective kernel of a spectral-normed layer, plus updated (u, v) state.

    torch keeps ``weight_orig`` with buffers ``weight_u`` (out,) and
    ``weight_v`` (prod(rest),).  In eval mode torch runs zero power
    iterations and computes ``sigma = u^T W v`` with the stored vectors; in
    train mode it first updates (v, u) once.  Pass ``n_power_iterations=1``
    to reproduce training behaviour; thread the returned state back into the
    params pytree.
    """
    w = params["weight_orig"]
    u = params["weight_u"]
    v = params["weight_v"]
    w_mat = w.reshape(w.shape[0], -1)

    def _normalize(x):
        return x / jnp.maximum(jnp.linalg.norm(x), eps)

    for _ in range(n_power_iterations):
        v = _normalize(w_mat.T @ u)
        u = _normalize(w_mat @ v)

    sigma = u @ (w_mat @ v)
    return w / sigma, {"weight_u": u, "weight_v": v}
