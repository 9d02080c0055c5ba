"""Fused MRF-round Pallas kernel vs the XLA composition.

The kernel (ops/pallas/mrf_round_kernel.py) runs interpret-mode here (CPU
mesh); on TPU the same code lowers to Mosaic.  Every test pins the fused
path against the unfused resblock/generator implementations that are
themselves golden-tested against the reference torch code
(tests/test_reference_parity.py), so agreement here extends the parity
chain to the fused kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletts2_tpu.models.decoder.resblock import (
    adain_resblock1_apply, adain_resblock1_fused, init_adain_resblock1)
from styletts2_tpu.nn.activations import snake
from styletts2_tpu.nn.conv import conv1d
from styletts2_tpu.nn.norm import masked_instance_norm1d
from styletts2_tpu.ops.pallas.mrf_round_kernel import (
    fused_mrf_round, masked_stats_guarded, pack_guarded, pack_plane,
    pick_t_blk, stats_from_partials, unpack_guarded)


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)


def test_fused_round_matches_composition():
    rng = np.random.default_rng(0)
    b, c, t = 3, 16, 200
    t_blk = 48          # TP = 240 > T: exercises the alignment tail
    k, d = 7, 3
    pad = (k * d - d) // 2
    x = _rand(rng, (b, c, t))
    lengths = jnp.asarray([t, 150, 64], jnp.int32)
    gamma = _rand(rng, (b, c), 0.1)
    beta = _rand(rng, (b, c), 0.1)
    alpha = jnp.asarray(np.abs(rng.standard_normal(c)) + 0.5, jnp.float32)
    w = _rand(rng, (c, c, k), 0.05)
    bias = _rand(rng, (c,), 0.1)

    keep = jnp.arange(t)[None, :] < lengths[:, None]
    u = (1.0 + gamma[:, :, None]) * masked_instance_norm1d(x, keep) \
        + beta[:, :, None]
    y_ref = conv1d(snake(u, alpha[None, :, None]), w, bias,
                   padding=pad, dilation=d)

    x_pad = pack_guarded(x, t_blk)
    mean, rstd = masked_stats_guarded(x_pad, lengths, t_blk, t)
    y_pad, parts = fused_mrf_round(
        x_pad, pack_plane(mean, rstd, gamma, beta, alpha, bias),
        jnp.transpose(w, (2, 1, 0)), lengths,
        k=k, d=d, t_blk=t_blk, t=t, emit_stats=True, interpret=True)
    np.testing.assert_allclose(unpack_guarded(y_pad, t_blk, t), y_ref,
                               atol=2e-5, rtol=1e-5)

    # chained statistics == a fresh masked reduction over the output
    m_chain, r_chain = stats_from_partials(parts, lengths, t)
    n = jnp.maximum(keep.sum(-1), 1)[:, None].astype(jnp.float32)
    m_ref = (y_ref * keep[:, None, :]).sum(-1) / n
    v_ref = (jnp.square(y_ref - m_ref[:, :, None]) * keep[:, None, :]).sum(-1) / n
    np.testing.assert_allclose(m_chain, m_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(r_chain, 1.0 / jnp.sqrt(v_ref + 1e-5),
                               atol=1e-4, rtol=1e-4)

    # guard blocks stay zero (the alignment tail [T, TP) may hold bias
    # values — the next round re-zeroes it before its conv, like XLA's
    # zero conv padding)
    y_np = np.asarray(y_pad)
    tpg = y_np.shape[1]
    assert np.all(y_np[:, :t_blk] == 0) and np.all(y_np[:, tpg - t_blk:] == 0)


@pytest.mark.parametrize("kernel,dil", [(3, (1, 3, 5)), (11, (1, 3, 5))])
def test_fused_resblock_matches_apply(kernel, dil):
    rng = np.random.default_rng(1)
    b, c, t, style = 2, 16, 150, 8
    t_blk = pick_t_blk(t, target=64)
    p = init_adain_resblock1(jax.random.PRNGKey(0), c, kernel, dil, style)
    x = _rand(rng, (b, c, t))
    s = _rand(rng, (b, style))
    lengths = jnp.asarray([t, 90], jnp.int32)

    y_ref = adain_resblock1_apply(p, x, s, kernel, dil, lengths=lengths)
    y_pad, _ = adain_resblock1_fused(p, pack_guarded(x, t_blk), s, kernel,
                                     dil, lengths, t, t_blk, interpret=True)
    np.testing.assert_allclose(unpack_guarded(y_pad, t_blk, t), y_ref,
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("decoder_type", ["istftnet", "hifigan"])
def test_generator_fused_matches_unfused(decoder_type):
    from styletts2_tpu import testing
    from styletts2_tpu.models.decoder import hifigan, istftnet
    from styletts2_tpu.ops import fused as F

    mp = testing.tiny_model_params(decoder_type=decoder_type)
    mod = istftnet if decoder_type == "istftnet" else hifigan
    params = jax.jit(lambda k: mod.init_decoder(
        k, mp.decoder, dim_in=16, style_dim=mp.style_dim, width=64,
        asr_res_ch=8))(jax.random.PRNGKey(2))

    rng = np.random.default_rng(3)
    b, t_en = 2, 20
    asr = _rand(rng, (b, 16, t_en))
    f0 = jnp.abs(_rand(rng, (b, 2 * t_en))) * 100
    n = _rand(rng, (b, 2 * t_en))
    s = _rand(rng, (b, mp.style_dim))
    lengths = jnp.asarray([t_en, 14], jnp.int32)

    y_ref = mod.decoder_apply(params, mp.decoder, asr, f0, n, s,
                              lengths=lengths, fused=False)
    F.set_mrf_round_impl("interpret")
    try:
        y_fused = mod.decoder_apply(params, mp.decoder, asr, f0, n, s,
                                    lengths=lengths, fused=True)
    finally:
        F.set_mrf_round_impl("auto")
    np.testing.assert_allclose(y_fused, y_ref, atol=2e-4, rtol=1e-3)


def test_resolve_mrf_round_off_on_cpu():
    from styletts2_tpu.ops import fused as F

    # auto must resolve to the unfused XLA path on the CPU mesh (no VJP on
    # the kernel -> training paths must never see it implicitly)
    assert F.resolve_mrf_round() is None
