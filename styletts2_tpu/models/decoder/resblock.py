"""AdaINResBlock1 — the Snake-activated MRF residual block shared by both
vocoders (ref: Modules/istftnet.py:27-81, Modules/hifigan.py:26-80).

Three rounds of [AdaIN -> Snake -> dilated conv -> AdaIN -> Snake -> conv],
each with per-channel learnable Snake alphas, accumulated residually.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ...nn.conv import conv1d, conv1d_folded, mxu_conv_forms
from ...nn.param_norm import weight_norm_kernel
from ...ops.fused import adain_snake
from .. import common as cm


def _get_padding(kernel: int, dilation: int) -> int:
    return (kernel * dilation - dilation) // 2


def init_adain_resblock1(key, channels: int, kernel_size: int = 3,
                         dilation: Sequence[int] = (1, 3, 5),
                         style_dim: int = 64) -> Dict:
    ks = jax.random.split(key, 12)
    p: Dict = {"convs1": {}, "convs2": {}, "adain1": {}, "adain2": {},
               "alpha1": {}, "alpha2": {}}
    for i in range(3):
        p["convs1"][str(i)] = cm.init_wn_conv(
            ks[i], channels, channels, kernel_size, w_init=cm.jinit_hifigan)
        p["convs2"][str(i)] = cm.init_wn_conv(
            ks[3 + i], channels, channels, kernel_size, w_init=cm.jinit_hifigan)
        p["adain1"][str(i)] = {"fc": cm.init_linear(ks[6 + i], style_dim, channels * 2)}
        p["adain2"][str(i)] = {"fc": cm.init_linear(ks[9 + i], style_dim, channels * 2)}
        p["alpha1"][str(i)] = jnp.ones((1, channels, 1))
        p["alpha2"][str(i)] = jnp.ones((1, channels, 1))
    return p


def adain_resblock1_fused(p: Dict, x_pad: jnp.ndarray, s: jnp.ndarray,
                          kernel_size: int, dilation: Sequence[int],
                          lengths: jnp.ndarray, t: int, t_blk: int,
                          stats=None, interpret: bool = False,
                          conv_mode: str = "taps"):
    """Fused-kernel resblock on a guarded channels-last buffer.

    Same math as ``adain_resblock1_apply`` but each of the 6
    AdaIN->Snake->conv rounds is ONE Pallas pass
    (ops/pallas/mrf_round_kernel.py) and the instance-norm statistics chain
    through the kernel's emitted partials — only the caller-supplied
    ``stats`` of the input (shared across a stage's resblocks) ever costs a
    separate reduction.  Inference-only (no custom VJP).

    Returns ``(out_pad, (mean, rstd) of out)``.
    """
    from ...nn.linear import linear
    from ...ops.pallas.mrf_round_kernel import (
        fused_mrf_round, masked_stats_guarded, pack_plane, stats_from_partials)
    from ...nn.param_norm import weight_norm_kernel

    if stats is None:
        stats = masked_stats_guarded(x_pad, lengths, t_blk, t)
    mean, rstd = stats
    for i in range(3):
        si = str(i)
        w1 = jnp.transpose(weight_norm_kernel(p["convs1"][si]), (2, 1, 0))
        w2 = jnp.transpose(weight_norm_kernel(p["convs2"][si]), (2, 1, 0))
        a1 = linear(s, p["adain1"][si]["fc"]["weight"],
                    p["adain1"][si]["fc"]["bias"])
        g1, b1 = jnp.split(a1, 2, axis=-1)
        a2 = linear(s, p["adain2"][si]["fc"]["weight"],
                    p["adain2"][si]["fc"]["bias"])
        g2, b2 = jnp.split(a2, 2, axis=-1)
        h_pad, parts = fused_mrf_round(
            x_pad,
            pack_plane(mean, rstd, g1, b1, p["alpha1"][si].reshape(-1),
                       p["convs1"][si]["bias"]),
            w1, lengths, k=kernel_size, d=int(dilation[i]), t_blk=t_blk, t=t,
            emit_stats=True, interpret=interpret, conv_mode=conv_mode)
        mh, rh = stats_from_partials(parts, lengths, t)
        x_pad, parts2 = fused_mrf_round(
            h_pad,
            pack_plane(mh, rh, g2, b2, p["alpha2"][si].reshape(-1),
                       p["convs2"][si]["bias"]),
            w2, lengths, k=kernel_size, d=1, t_blk=t_blk, t=t,
            residual=x_pad, emit_stats=True, interpret=interpret,
            conv_mode=conv_mode)
        mean, rstd = stats_from_partials(parts2, lengths, t)
    return x_pad, (mean, rstd)


def _mrf_conv(p: Dict, x: jnp.ndarray, kernel_size: int,
              dilation: int) -> jnp.ndarray:
    """Weight-normed 'same' MRF conv; small-channel towers fold time into
    channels (conv1d_folded) so HiFi-GAN's C=32/64 stages feed the
    128-lane MXU instead of running at 5-18% MFU.  TPU-only: the extra
    paper FLOPs are a loss on CPU meshes (nn/conv.py::mxu_conv_forms)."""
    c = x.shape[1]
    if c < 128 and 128 % c == 0 and mxu_conv_forms():
        return conv1d_folded(x, weight_norm_kernel(p), p.get("bias"),
                             dilation=dilation, fold=128 // c)
    return conv1d(x, weight_norm_kernel(p), p.get("bias"),
                  padding=_get_padding(kernel_size, dilation),
                  dilation=dilation)


def adain_resblock1_apply(p: Dict, x: jnp.ndarray, s: jnp.ndarray,
                          kernel_size: int = 3,
                          dilation: Sequence[int] = (1, 3, 5),
                          lengths=None) -> jnp.ndarray:
    """Each AdaIN -> Snake pair goes through ops/fused.py::adain_snake —
    one call site for the XLA composition and the optional fused Pallas
    kernel (measured a wash at production shapes; see ops/fused.py)."""
    for i in range(3):
        h = adain_snake(p["adain1"][str(i)], x, s, p["alpha1"][str(i)],
                        lengths=lengths)
        h = _mrf_conv(p["convs1"][str(i)], h, kernel_size, dilation[i])
        h = adain_snake(p["adain2"][str(i)], h, s, p["alpha2"][str(i)],
                        lengths=lengths)
        h = _mrf_conv(p["convs2"][str(i)], h, kernel_size, 1)
        x = x + h
    return x


_BRANCH_SCAN_ENABLED = False  # see mrf_branch_scan_enabled


def set_mrf_branch_scan(enabled: bool) -> None:
    """Toggle the training-step lax.scan MRF form (or STYLETTS2_MRF_SCAN=1/0
    env, which wins)."""
    global _BRANCH_SCAN_ENABLED
    _BRANCH_SCAN_ENABLED = enabled


def mrf_branch_scan_enabled() -> bool:
    """Whether training decoders use the scanned MRF form.

    Default OFF: the scan cuts the decoder's own fwd+bwd compile 3.5x
    (657 -> 186 s, scripts/compile_profile.py) and is exact, but on THIS
    image's tunneled backend the FULL stage-2 step containing it is
    SIGKILLed by the remote compile helper (compile-memory explosion of
    the scan+remat transpose inside libtpu AOT), while the unrolled step
    compiles fine.  Opt in with STYLETTS2_MRF_SCAN=1 on runtimes with a
    local TPU compiler."""
    import os

    env = os.environ.get("STYLETTS2_MRF_SCAN")
    if env is not None:
        return env == "1"
    return _BRANCH_SCAN_ENABLED


def _pad_kernel_center(w: jnp.ndarray, k_to: int) -> jnp.ndarray:
    """Zero-pad a (out, in, k) kernel symmetrically to width ``k_to``.

    'same'-padded conv with the centered zero-padded kernel equals the
    'same' conv of the original (the zero taps contribute exactly 0), so
    branches with different kernel widths become shape-uniform — exact."""
    k = w.shape[-1]
    lo = (k_to - k) // 2
    return jnp.pad(w, ((0, 0), (0, 0), (lo, k_to - k - lo)))


def mrf_branches_scan(blocks, x: jnp.ndarray, s: jnp.ndarray,
                      kernel_sizes: Sequence[int],
                      dilation: Sequence[int] = (1, 3, 5),
                      lengths=None) -> jnp.ndarray:
    """Mean over the MRF branch resblocks as ONE lax.scan iteration per
    branch, with kernels zero-padded to max(kernel_sizes).

    Compile-time form for the TRAINING step only: the unrolled 3-branch
    stage (36 convs fwd+bwd per stage) dominates the step's XLA compile
    through this image's tunnel backend, where compile wall-time scales
    with op count (~2-4 s per conv emission; scripts/compile_profile.py
    measured the decoder's fwd+bwd alone at 657 s).  The scan cuts the
    branch HLO 3x for a measured runtime cost of the padded k3/k7 taps
    (33/21 = 1.57x of the MRF conv FLOPs) — the inference path keeps the
    unrolled exact-width convs.  Numerically exact vs the unrolled form up
    to conv accumulation order (zero taps contribute 0).
    """
    k_max = max(kernel_sizes)
    # zero-padding weight_v leaves the per-output-channel weight-norm
    # (over the (in, k) dims) unchanged, so g*v/||v|| pads exactly too
    padded = []
    for bp in blocks:
        q = {"adain1": bp["adain1"], "adain2": bp["adain2"],
             "alpha1": bp["alpha1"], "alpha2": bp["alpha2"],
             "convs1": {}, "convs2": {}}
        for name in ("convs1", "convs2"):
            for si, cp in bp[name].items():
                q[name][si] = {
                    k: (_pad_kernel_center(v, k_max)
                        if k in ("weight", "weight_v") else v)
                    for k, v in cp.items()}
        padded.append(q)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *padded)

    # remat the body: without it the scan's VJP stacks every branch's f32
    # intermediates as (n_branches, B, C, T) residuals — 27 GB at the
    # stage-2 bench shapes (the unrolled form let XLA fuse/rematerialize).
    # The recompute costs one extra branch forward in the backward pass.
    @jax.checkpoint
    def body(acc, bp):
        r = adain_resblock1_apply(bp, x, s, k_max, dilation, lengths=lengths)
        return acc + r, None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(x), stacked)
    return acc / len(blocks)
