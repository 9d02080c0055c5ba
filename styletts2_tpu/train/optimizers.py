"""Per-module optimizers (ref: optimizers.py).

The reference builds one AdamW (betas (0, 0.99), wd 1e-4, eps 1e-9) +
OneCycleLR per module and steps arbitrary subsets per phase
(``optimizer.step('msd')`` ...).  Note the reference's OneCycle is configured
with div_factor = final_div_factor = 1 and pct_start 0 (ref: optimizers.py:
110-120), which makes the schedule a *constant* max_lr — reproduced here as a
constant schedule by default, with a real one-cycle available.

TPU-native shape: optax transforms with per-module states; a train step
computes grads for the whole zoo once and applies updates only to the modules
named in a static ``active`` tuple — the per-phase module gating the
reference does with separate ``.step()`` calls, but inside one jitted step.
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def make_tx(lr: float, weight_decay: float = 1e-4) -> optax.GradientTransformation:
    return optax.adamw(learning_rate=lr, b1=0.0, b2=0.99, eps=1e-9,
                       weight_decay=weight_decay)


def one_cycle_schedule(max_lr: float, total_steps: int, pct_start: float = 0.0,
                       div_factor: float = 1.0, final_div_factor: float = 1.0):
    """Real OneCycle for users who want an actual schedule."""
    warmup = max(1, int(total_steps * pct_start)) if pct_start > 0 else 0
    init_lr = max_lr / div_factor
    final_lr = init_lr / final_div_factor
    if warmup == 0:
        return optax.cosine_decay_schedule(max_lr, max(1, total_steps),
                                           alpha=final_lr / max_lr)
    return optax.join_schedules(
        [optax.linear_schedule(init_lr, max_lr, warmup),
         optax.cosine_decay_schedule(max_lr, max(1, total_steps - warmup),
                                     alpha=final_lr / max_lr)],
        [warmup],
    )


class MultiOptimizer:
    """Keyed per-module optax optimizers over a zoo params dict."""

    def __init__(self, params: Mapping, lr_map: Mapping[str, float],
                 default_lr: float = 1e-4, weight_decay: float = 1e-4):
        self.keys = tuple(k for k in params.keys())
        self.txs = {
            k: make_tx(lr_map.get(k, default_lr), weight_decay) for k in self.keys
        }

    def init(self, params: Mapping) -> Dict:
        return {k: self.txs[k].init(params[k]) for k in self.keys}

    def apply(
        self,
        params: Mapping,
        grads: Mapping,
        states: Mapping,
        active: Tuple[str, ...],
    ) -> Tuple[Dict, Dict]:
        """Apply updates for the modules in ``active`` (a static tuple); all
        other modules pass through untouched."""
        new_params = dict(params)
        new_states = dict(states)
        for k in active:
            updates, new_states[k] = self.txs[k].update(grads[k], states[k], params[k])
            new_params[k] = optax.apply_updates(params[k], updates)
        return new_params, new_states


def global_grad_norm(grads) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def scale_module_grads(grads: Mapping, scales: Mapping[str, float]) -> Dict:
    """Per-module gradient scaling (ref: train_second.py:856-882 scales
    predictor/diffusion grads by 0.01 in the SLM-adversarial phase)."""
    out = dict(grads)
    for k, s in scales.items():
        if k in out:
            out[k] = jax.tree_util.tree_map(lambda g: g * s, out[k])
    return out


def clip_by_global_norm_if_above(grads, thresh: float):
    """Rescale all grads when the global norm exceeds ``thresh``
    (ref: train_second.py:856-866)."""
    norm = global_grad_norm(grads)
    scale = jnp.where(norm > thresh, thresh / (norm + 1e-12), 1.0)
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm
