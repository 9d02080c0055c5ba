"""Dispatch for fused elementwise kernels.

``adain_snake`` is the AdaIN1d -> Snake pair of the vocoder MRF resblocks
(ref: Modules/istftnet.py:27-81).  A fused Pallas kernel exists
(ops/pallas/adain_snake_kernel.py: one-pass masked stats + affine + snake,
custom VJP) and matches the XLA composition exactly, but a double-window A/B
at full stage-2 decoder shapes measured it a wash (XLA 141.9/51.2 ms
fwd+bwd/fwd vs Pallas 145.3/50.7 — XLA already fuses this chain), so "auto"
resolves to the XLA composition everywhere; ``set_adain_snake_impl("pallas")``
opts in.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..nn.activations import snake
from ..nn.linear import linear

ADAIN_SNAKE_IMPL = "auto"  # auto | pallas | xla | interpret


def set_adain_snake_impl(impl: str):
    global ADAIN_SNAKE_IMPL
    assert impl in ("auto", "pallas", "xla", "interpret"), impl
    ADAIN_SNAKE_IMPL = impl


# Fused MRF round (norm+snake+conv in one Pallas pass with chained stats,
# ops/pallas/mrf_round_kernel.py) for the vocoder generator's INFERENCE
# path.  "auto" resolves to the Pallas kernel on TPU (measured 2.4x on the
# generator stages — the AdaIN+Snake HBM passes vanish) and to the plain XLA
# composition elsewhere; the kernel has no VJP, so training always uses the
# unfused path regardless of this flag.
MRF_ROUND_IMPL = "auto"  # auto | pallas | interpret | off


def set_mrf_round_impl(impl: str):
    global MRF_ROUND_IMPL
    assert impl in ("auto", "pallas", "interpret", "off"), impl
    MRF_ROUND_IMPL = impl


def resolve_mrf_round() -> Optional[str]:
    """None (use the XLA composition) or a Pallas mode for the fused path."""
    if MRF_ROUND_IMPL == "auto":
        return "pallas" if jax.default_backend() == "tpu" else None
    if MRF_ROUND_IMPL == "off":
        return None
    return MRF_ROUND_IMPL


def _resolve() -> str:
    if ADAIN_SNAKE_IMPL != "auto":
        return ADAIN_SNAKE_IMPL
    # measured: XLA fuses this chain as well as the hand-written kernel at
    # production shapes (see module docstring), so auto == xla
    return "xla"


def adain_snake(adain_params: Dict, x: jnp.ndarray, s: jnp.ndarray,
                alpha: jnp.ndarray,
                lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``snake(adain1d(params, x, s), alpha)`` on (B, C, T).

    ``alpha`` is the reference's (1, C, 1) parameter; ``lengths`` (B,)
    restricts the norm statistics to valid frames (padded batches).
    """
    impl = _resolve()
    h = linear(s, adain_params["fc"]["weight"], adain_params["fc"]["bias"])
    gamma, beta = jnp.split(h, 2, axis=-1)                   # (B, C) each
    if impl in ("pallas", "interpret"):
        from .pallas.adain_snake_kernel import adain_snake_pallas

        b, c, t = x.shape
        lens = (jnp.full((b,), t, jnp.int32) if lengths is None
                else lengths.astype(jnp.int32))
        return adain_snake_pallas(
            x, gamma.astype(jnp.float32), beta.astype(jnp.float32),
            alpha.reshape(-1).astype(jnp.float32), lens,
            impl == "interpret")
    keep = None
    if lengths is not None:
        keep = jnp.arange(x.shape[-1])[None, :] < lengths[:, None]
    y = (1.0 + gamma[:, :, None]) * _norm(x, keep) + beta[:, :, None]
    return snake(y, alpha)


def _norm(x, keep):
    from ..nn.norm import instance_norm, masked_instance_norm1d

    return instance_norm(x) if keep is None else masked_instance_norm1d(x, keep)
