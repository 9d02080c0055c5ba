"""GAN discriminators (ref: Modules/discriminators.py).

- MultiPeriodDiscriminator: five period reshapers (2/3/5/7/11) with strided
  Conv2d towers over (T/p, p)-folded waveforms.
- MultiResSpecDiscriminator: three STFT-magnitude Conv2d towers.
- WhisperDiscriminator: Conv1d tower over stacked Whisper hidden states
  (slm_hidden * slm_layers channels), the SLM adversarial head.

All convs are weight-normed; feature maps are returned for the
feature-matching loss.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.stft import hann_window, stft
from . import common as cm

LRELU_SLOPE = 0.1

PERIODS = (2, 3, 5, 7, 11)
SPEC_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


# ---------------------------------------------------------------------------
# Multi-period discriminator
# ---------------------------------------------------------------------------

MPD_CHANNELS = (32, 128, 512, 1024, 1024)


def init_mpd(key, channels: Sequence[int] = MPD_CHANNELS) -> Dict:
    p: Dict = {"discriminators": {}}
    chans = list(zip((1,) + tuple(channels[:-1]), channels))
    for i, _ in enumerate(PERIODS):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        convs = {str(j): cm.init_wn_conv(ks[j], ci, co, (5, 1))
                 for j, (ci, co) in enumerate(chans)}
        p["discriminators"][str(i)] = {
            "convs": convs,
            "conv_post": cm.init_wn_conv(ks[5], channels[-1], 1, (3, 1)),
        }
    return p


def _discriminator_p(p: Dict, x: jnp.ndarray, period: int) -> Tuple[jnp.ndarray, List]:
    """One period tower (ref: Modules/discriminators.py periods' DiscriminatorP).

    TPU layout note: the reference formulates this as Conv2d towers over the
    (T/p, p) fold, which puts the tiny period axis (2..11) on the TPU lane
    dimension and wastes >90% of every vector register.  All kernels are
    (5,1)/(3,1) — they never mix the p columns — so the fold is moved into
    the *batch* axis instead and the towers run as dense conv1d over T/p:
    identical math, MXU-friendly tiling.  Feature maps are reshaped back to
    the reference's (B, C, T/p, p) so the feature-matching loss sees the
    same tensors.
    """
    b, c, t = x.shape
    if t % period != 0:
        pad = period - (t % period)
        x = jnp.concatenate([x, x[..., -pad - 1:-1][..., ::-1]], axis=-1)  # reflect
        t = t + pad
    h = t // period
    # (B, C, H, p) -> (B, p, C, H) -> (B*p, C, H): period joins the batch
    x = x.reshape(b, c, h, period)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b * period, c, h)

    def unfold(y: jnp.ndarray) -> jnp.ndarray:
        bp, cc, hh = y.shape
        return jnp.transpose(y.reshape(b, period, cc, hh), (0, 2, 3, 1))

    fmap = []
    for j in range(5):
        stride = 3 if j < 4 else 1
        w = p["convs"][str(j)]
        x = cm.wn_conv1d_from2d(w, x, stride=stride, padding=2)
        x = cm.leaky_relu(x, LRELU_SLOPE)
        fmap.append(unfold(x))
    x = cm.wn_conv1d_from2d(p["conv_post"], x, padding=1)
    fmap.append(unfold(x))
    return unfold(x).reshape(b, -1), fmap


def mpd_apply(params: Dict, y: jnp.ndarray, y_hat: jnp.ndarray,
              batched: bool = True):
    """Returns (real_scores, fake_scores, real_fmaps, fake_fmaps).

    ``batched=True`` runs real and fake through each tower as ONE 2B pass
    (the reference calls each tower twice): right for the discriminator step,
    where both branches are stop-gradient and only parameter grads flow.
    Use ``batched=False`` on the generator side — there the real branch is
    forward-only while the fake branch needs input gradients, and a fused 2B
    pass would drag the dead real half through the whole backward."""
    y, y_hat = cm.autocast(params, y, y_hat)
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    if batched:
        b = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        for i, period in enumerate(PERIODS):
            p = params["discriminators"][str(i)]
            s, fm = _discriminator_p(p, both, period)
            y_d_rs.append(s[:b]); fmap_rs.append([f[:b] for f in fm])
            y_d_gs.append(s[b:]); fmap_gs.append([f[b:] for f in fm])
    else:
        for i, period in enumerate(PERIODS):
            p = params["discriminators"][str(i)]
            r, fr = _discriminator_p(p, y, period)
            g, fg = _discriminator_p(p, y_hat, period)
            y_d_rs.append(r); fmap_rs.append(fr)
            y_d_gs.append(g); fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Multi-resolution spectrogram discriminator
# ---------------------------------------------------------------------------

def init_msd(key, width: int = 32) -> Dict:
    p: Dict = {"discriminators": {}}
    for i, _ in enumerate(SPEC_RESOLUTIONS):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        p["discriminators"][str(i)] = {
            "discriminators": {
                "0": cm.init_wn_conv(ks[0], 1, width, (3, 9)),
                "1": cm.init_wn_conv(ks[1], width, width, (3, 9)),
                "2": cm.init_wn_conv(ks[2], width, width, (3, 9)),
                "3": cm.init_wn_conv(ks[3], width, width, (3, 9)),
                "4": cm.init_wn_conv(ks[4], width, width, (3, 3)),
            },
            "out": cm.init_wn_conv(ks[5], width, 1, (3, 3)),
        }
    return p


DROP_NYQUIST = True  # 2^k+1 bin counts pad 8x on TPU lanes (T(2,128) layout);
                     # dropping the Nyquist bin restores dense tiling. Affects
                     # only discriminator scores (training dynamics), not audio.


# ---------------------------------------------------------------------------
# MSD towers: bin-packed layout for the MXU
#
# The towers are 32-channel convs; with channels on the TPU lane axis the MXU
# output tile is 32/128 lanes wide, capping utilization at 25%, and every
# activation pads 4x in HBM (the minor dim tiles to 128 lanes).  The packed
# path folds P=4 adjacent frequency bins into the channel axis END-TO-END:
# activations are (B, frames, bins/P, P*C) "super-bins" (dense 128-lane
# tiles), and each conv runs with a block-expanded kernel whose output
# channel q*C+c at super-bin o' equals plain-conv channel c at bin P*o'+q.
# Taps that fall outside a slot are zero entries in the expanded kernel, so
# the multiplies are a pure reshuffle of the plain conv's — exact math.
# Forward, input-grad and weight-grad convs all run with 128-channel
# operands.  Feature maps are returned in the packed layout: the
# feature-matching loss is a mean of absolute differences, invariant to the
# (consistent) bin shuffle; the final score conv unpacks first, so scores
# are exactly the reference's.  Parity (values and grads through the full
# loss): tests/test_aux_models.py::test_msd_packed_conv_parity.
# ---------------------------------------------------------------------------

_SPEC_CONV_IMPL = "auto"  # auto | plain | packed
_PACK = 4


def set_spec_conv_impl(impl: str) -> None:
    global _SPEC_CONV_IMPL
    assert impl in ("auto", "plain", "packed"), impl
    _SPEC_CONV_IMPL = impl


def _use_packed_spec_conv() -> bool:
    if _SPEC_CONV_IMPL != "auto":
        return _SPEC_CONV_IMPL == "packed"
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pack_bins(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W/p, p*C); packed channel r*C+c is bin r."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // p, p * c)


def _unpack_bins(x: jnp.ndarray, p: int) -> jnp.ndarray:
    b, h, u, pc = x.shape
    return x.reshape(b, h, u * p, pc // p)


def _packed_conv(p: Dict, x: jnp.ndarray, kh_pad: int, stride_w: int,
                 pad_w: int) -> jnp.ndarray:
    """One tower conv on packed activations.

    x: (B, H, W_in/P, P*c_in); returns (B, H, W_out/P, P*c_out) where the
    plain conv maps W_in -> W_out with ``stride_w``/``pad_w``.
    """
    from ..nn.conv import conv2d_nhwc

    P = _PACK
    w = cm.weight_norm_kernel(p)          # (c_out, c_in, kh, kw)
    c_out, c_in, kh, kw = w.shape
    u_in = x.shape[2]
    w_in = u_in * P
    w_out = (w_in + 2 * pad_w - kw) // stride_w + 1
    assert w_out % P == 0
    # output super-bin o' covers bins P*o'+q; tap k of bin P*o'+q reads input
    # bin stride_w*(P*o'+q) - pad_w + k.  With off0 = (-pad_w) mod P the
    # window starts at super slot (stride_w*P*o' - pad_w - off0)/P and tap
    # offsets t = off0 + stride_w*q + k are slot t//P, lane-block t%P.
    off0 = (-pad_w) % P
    span = off0 + stride_w * (P - 1) + kw
    n_slots = -(-span // P)
    # static 0/1 selector: sel[q, k, r, j] = 1 iff tap k of lane-block q lands
    # in input lane-block r of slot j.  One einsum replaces P*kw traced
    # scatter ops (trace time and HLO size both scale with the tower depth).
    sel = np.zeros((P, kw, P, n_slots), np.float32)
    for q in range(P):
        for k in range(kw):
            t = off0 + stride_w * q + k
            sel[q, k, t % P, t // P] = 1.0
    wexp = jnp.einsum("oihk,qkrj->qorihj", w, jnp.asarray(sel, w.dtype))
    wexp = wexp.reshape(P * c_out, P * c_in, kh, n_slots)
    start0 = (0 * stride_w * P - pad_w - off0) // P
    pad_l = max(0, -start0)
    o_last = w_out // P - 1
    end_last = (stride_w * P * o_last - pad_w - off0) // P + n_slots - 1
    pad_r = max(0, end_last - (u_in - 1))
    # super stride: consecutive o' advance the window by stride_w*P bins,
    # i.e. stride_w super slots
    y = conv2d_nhwc(x, wexp.astype(x.dtype), None,
                    stride=(1, stride_w),
                    padding=((kh_pad, kh_pad), (pad_l, pad_r)))
    bias = p.get("bias")
    if bias is not None:
        y = y + jnp.tile(bias, P)
    return y


def _spec_tower_packed(p: Dict, x: jnp.ndarray):
    """Full packed tower: x (B, frames, bins, 1) -> (scores, packed fmaps)."""
    P = _PACK
    y = _pack_bins(x, P)                                  # (B, H, W/4, 4)
    fmap = []
    specs = [  # (kh_pad, stride_w, pad_w)
        (1, 1, 4),
        (1, 2, 4),
        (1, 2, 4),
        (1, 2, 4),
        (1, 1, 1),
    ]
    for j, (kh_pad, s, pw) in enumerate(specs):
        y = _packed_conv(p["discriminators"][str(j)], y, kh_pad, s, pw)
        y = cm.leaky_relu(y, LRELU_SLOPE)
        fmap.append(y)
    y = _unpack_bins(y, P)
    y = cm.wn_conv2d_nhwc(p["out"], y, padding=(1, 1))
    fmap.append(y)
    return y.reshape(y.shape[0], -1), fmap


def _spec_discriminator(p: Dict, x: jnp.ndarray, res) -> Tuple[jnp.ndarray, List]:
    """One STFT-magnitude tower (ref: Modules/discriminators.py:20-61).

    TPU layout note: the tower runs channels-LAST (B, frames, bins, C) so the
    32-channel axis lands on vector lanes (~25% faster than NCHW here).
    Feature maps are returned in NHWC; the feature-matching loss is a mean of
    absolute differences, which is layout-invariant, and the final score has
    one channel so its flattening matches the reference exactly."""
    n_fft, hop, win = res
    mag = jnp.abs(stft(x[:, 0, :], n_fft, hop, win, hann_window(win)))
    if DROP_NYQUIST:
        mag = mag[:, :-1, :]
    # the STFT is fp32-pinned; the conv tower runs in the params' dtype
    y = cm.autocast(p, jnp.swapaxes(mag, 1, 2)[..., None])   # (B, frames, bins, 1)
    if _use_packed_spec_conv() and y.shape[2] % (_PACK * 8) == 0:
        return _spec_tower_packed(p, y)
    fmap = []
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [(1, 4), (1, 4), (1, 4), (1, 4), (1, 1)]
    for j in range(5):
        y = cm.wn_conv2d_nhwc(p["discriminators"][str(j)], y,
                              stride=strides[j], padding=pads[j])
        y = cm.leaky_relu(y, LRELU_SLOPE)
        fmap.append(y)
    y = cm.wn_conv2d_nhwc(p["out"], y, padding=(1, 1))
    fmap.append(y)
    return y.reshape(y.shape[0], -1), fmap


def msd_apply(params: Dict, y: jnp.ndarray, y_hat: jnp.ndarray,
              batched: bool = True):
    """Real and fake share one batched tower pass per resolution when
    ``batched`` (discriminator step); separate passes on the generator side
    (see mpd_apply for the gradient-shape rationale)."""
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    if batched:
        b = y.shape[0]
        both = jnp.concatenate([y, y_hat], axis=0)
        for i, res in enumerate(SPEC_RESOLUTIONS):
            p = params["discriminators"][str(i)]
            s, fm = _spec_discriminator(p, both, res)
            y_d_rs.append(s[:b]); fmap_rs.append([f[:b] for f in fm])
            y_d_gs.append(s[b:]); fmap_gs.append([f[b:] for f in fm])
    else:
        for i, res in enumerate(SPEC_RESOLUTIONS):
            p = params["discriminators"][str(i)]
            r, fr = _spec_discriminator(p, y, res)
            g, fg = _spec_discriminator(p, y_hat, res)
            y_d_rs.append(r); fmap_rs.append(fr)
            y_d_gs.append(g); fmap_gs.append(fg)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ---------------------------------------------------------------------------
# Whisper (SLM) discriminator head
# ---------------------------------------------------------------------------

def init_whisper_discriminator(key, slm_hidden: int = 512, slm_layers: int = 7,
                               initial_channel: int = 64) -> Dict:
    ks = jax.random.split(key, 5)
    c = initial_channel
    return {
        "pre": cm.init_wn_conv(ks[0], slm_hidden * slm_layers, c, 1),
        "convs": {
            "0": cm.init_wn_conv(ks[1], c, c * 2, 5),
            "1": cm.init_wn_conv(ks[2], c * 2, c * 4, 5),
            "2": cm.init_wn_conv(ks[3], c * 4, c * 4, 5),
        },
        "conv_post": cm.init_wn_conv(ks[4], c * 4, 1, 3),
    }


def whisper_discriminator_apply(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, slm_hidden*slm_layers, T) stacked SLM features -> (B, T) scores."""
    x = cm.wn_conv1d(params["pre"], x)
    for j in range(3):
        x = cm.wn_conv1d(params["convs"][str(j)], x, padding=2)
        x = cm.leaky_relu(x, LRELU_SLOPE)
    x = cm.wn_conv1d(params["conv_post"], x, padding=1)
    return x.reshape(x.shape[0], -1)
