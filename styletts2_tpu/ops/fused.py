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

from ..nn.linear import linear

ADAIN_SNAKE_IMPL = "auto"  # auto | pallas | xla | interpret


def set_adain_snake_impl(impl: str):
    global ADAIN_SNAKE_IMPL
    assert impl in ("auto", "pallas", "xla", "interpret"), impl
    ADAIN_SNAKE_IMPL = impl


# Fused MRF round (norm+snake+conv in one Pallas pass with chained stats,
# ops/pallas/mrf_round_kernel.py).  Measured on the v5e at the stage-1
# vocoder shapes (k=11 resblock, B=16, C=128, T=48001, bf16):
#   XLA composition, original snake:           33.8 ms
#   Pallas fused round (taps):                 38-40 ms
#   XLA composition, polynomial snake:         20.5 ms   <- default
#   Pallas fused round, polynomial snake:      24.9 ms
# The pair's cost was the VPU sine (~9x an HBM pass), not memory passes;
# with the cheap snake the XLA path wins because its conv emitter runs at
# 60-70% MFU while the in-kernel per-tap dots pay a sublane realignment per
# tap (~33% MFU; the im2col form does not lower in Mosaic).  "auto"
# therefore resolves to the XLA composition everywhere; the kernel stays as
# an opt-in ("pallas") for future Mosaic revisions.
MRF_ROUND_IMPL = "auto"  # auto | pallas | interpret | off


def set_mrf_round_impl(impl: str):
    global MRF_ROUND_IMPL
    assert impl in ("auto", "pallas", "interpret", "off"), impl
    MRF_ROUND_IMPL = impl


def resolve_mrf_round() -> Optional[str]:
    """None (use the XLA composition) or a Pallas mode for the fused path."""
    if MRF_ROUND_IMPL in ("auto", "off"):
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
    # Single-expression composition: two fused reduction passes for the
    # statistics (centered variance — the E[x^2] one-pass form loses ~5e-3
    # through the deep resblock chains once the snake drifts the mean) and
    # ONE read+write pass for normalize+affine+snake, with no materialized
    # f32 intermediate.  The previous instance_norm -> affine -> snake chain
    # materialized two intermediates (~2.6 ms/pair vs ~1.1 ms at B=16,
    # C=128, T=48000 bf16 — probe_chain.py); this form is what the fused
    # Pallas round kernel failed to beat because XLA's conv emitter is
    # already at 60-70% MFU.
    xf = x.astype(jnp.float32)
    t = x.shape[-1]
    if lengths is None:
        n = jnp.float32(t)
        mean = jnp.mean(xf, axis=-1)                         # (B, C)
        var = jnp.mean(jnp.square(xf - mean[:, :, None]), axis=-1)
    else:
        keep = (jnp.arange(t)[None, None, :] <
                lengths[:, None, None]).astype(jnp.float32)
        n = jnp.maximum(keep[:, 0, :].sum(-1), 1.0)[:, None]  # (B, 1)
        mean = jnp.sum(xf * keep, axis=-1) / n
        var = jnp.sum(jnp.square(xf - mean[:, :, None]) * keep, axis=-1) / n
    rstd = jax.lax.rsqrt(var + 1e-5)
    u = ((xf - mean[:, :, None]) * rstd[:, :, None]
         * (1.0 + gamma.astype(jnp.float32))[:, :, None]
         + beta.astype(jnp.float32)[:, :, None])
    from ..nn.activations import snake
    y = snake(u, alpha.astype(jnp.float32).reshape(1, -1, 1))
    return y.astype(x.dtype)
