import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.models.asr import ASRConfig, asr_apply, init_asr, _dct_matrix
from styletts2_tpu.models.jdc import JDCConfig, init_jdc, jdc_apply
from styletts2_tpu.models.discriminators import (
    init_mpd, init_msd, init_whisper_discriminator,
    mpd_apply, msd_apply, whisper_discriminator_apply,
)
from styletts2_tpu.losses import (
    multi_resolution_stft_loss,
    generator_loss_full,
    discriminator_loss_full,
)

KEY = jax.random.PRNGKey(0)


def test_dct_matrix_matches_scipy():
    import scipy.fft

    dct = _dct_matrix(40, 80)                      # (80, 40)
    x = np.random.default_rng(0).standard_normal(80).astype(np.float32)
    want = scipy.fft.dct(x, type=2, norm="ortho")[:40]
    got = x @ dct
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_asr_aligner_shapes():
    cfg = ASRConfig(hidden_dim=64, n_layers=2, n_token=50, token_embedding_dim=32,
                    location_kernel_size=7)
    params = init_asr(KEY, cfg)
    b, t_mel, t_text = 2, 24, 6
    mels = jax.random.normal(KEY, (b, 80, t_mel))
    mem_mask = jnp.zeros((b, t_mel // 2), dtype=bool).at[1, 9:].set(True)
    text = jax.random.randint(KEY, (b, t_text), 0, 50)
    out = asr_apply(params, mels, mem_mask, text, cfg)
    assert out["ctc_logits"].shape == (b, t_mel // 2, 50)
    assert out["s2s_logits"].shape == (b, t_text + 1, 50)
    assert out["s2s_attn"].shape == (b, t_text + 1, t_mel // 2)
    # attention rows are distributions over unmasked memory
    attn = np.asarray(out["s2s_attn"])
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-5)
    assert attn[1, :, 9:].sum() < 1e-6


def test_jdc_shapes():
    cfg = JDCConfig(lstm_hidden=16, lstm_layers=1)
    params = init_jdc(KEY, cfg)
    mels = jax.random.normal(KEY, (2, 80, 40))
    f0, voicing, feat = jdc_apply(params, mels, cfg)
    assert f0.shape == (2, 40)
    assert voicing.shape == (2, 40)
    assert (np.asarray(f0) >= 0).all()


def test_discriminators_and_gan_losses():
    kp, ks, kw = jax.random.split(KEY, 3)
    mpd = init_mpd(kp)
    msd = init_msd(ks)
    y = jax.random.normal(KEY, (2, 1, 4000)) * 0.1
    y_hat = jax.random.normal(jax.random.fold_in(KEY, 1), (2, 1, 4000)) * 0.1
    mpd_out = mpd_apply(mpd, y, y_hat)
    msd_out = msd_apply(msd, y, y_hat)
    assert len(mpd_out[0]) == 5 and len(msd_out[0]) == 3

    g = generator_loss_full(mpd_out, msd_out)
    d = discriminator_loss_full(mpd_out, msd_out)
    assert np.isfinite(float(g)) and np.isfinite(float(d))

    wd = init_whisper_discriminator(kw, slm_hidden=8, slm_layers=3, initial_channel=4)
    score = whisper_discriminator_apply(wd, jax.random.normal(KEY, (2, 24, 17)))
    assert score.shape == (2, 17)


def test_msd_packed_conv_parity():
    """The MXU bin-packed tower conv matches the plain conv (values to 1e-6;
    gradients to fp32 accumulation-order noise).

    Gradient tolerance calibration: the two layouts sum identical partial
    products in different orders, so gradients drift by fp32 accumulation
    noise.  The probe loss through the feature maps must be SMOOTH: an
    absolute-value term has gradient sign(f), and accumulation noise flips
    the sign of near-zero feature elements between layouts, turning an
    O(1e-7) forward difference into an O(1) gradient difference (measured:
    2.8e-2 max rel with an |f| term vs 1.8e-3 with f**2 on this host — same
    convs, same backward path).  With the smooth probe the measured max
    relative error is ~1.8e-3 (floor denom 1e-3); 5e-3 bounds it with margin
    while still catching any real index-algebra bug (those produce O(1)
    relative errors, not O(1e-3)).
    """
    from styletts2_tpu.models import discriminators as D

    msd = init_msd(jax.random.fold_in(KEY, 7))
    # wav length chosen so every tower's bin counts stay 2^k (nyquist dropped)
    y = jax.random.normal(KEY, (2, 1, 9600)) * 0.1
    y_hat = jax.random.normal(jax.random.fold_in(KEY, 1), (2, 1, 9600)) * 0.1

    def d_loss(p):
        rs, gs, frs, fgs = msd_apply(p, y, y_hat)
        loss = discriminator_loss_full(([], [], [], []), (rs, gs, frs, fgs))
        # smooth probe through every feature map (see docstring: |f| makes
        # this comparison discontinuous at near-zero features)
        fm = sum(jnp.sum(jnp.square(f)) for fam in frs for f in fam)
        return loss + 1e-3 * fm

    try:
        D.set_spec_conv_impl("plain")
        v0, g0 = jax.value_and_grad(d_loss)(msd)
        D.set_spec_conv_impl("packed")
        v1, g1 = jax.value_and_grad(d_loss)(msd)
    finally:
        D.set_spec_conv_impl("auto")
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    # fp32 accumulation order differs between the layouts; bound the
    # per-element relative error instead of bitwise equality
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(a), np.abs(b))
        rel = np.abs(a - b) / np.maximum(denom, 1e-3)
        assert rel.max() < 5e-3, (a.shape, rel.max())


def test_msd_packed_fallback_path():
    """Forced packed mode with bin counts not divisible by 32 (Nyquist kept:
    513/1025/257 bins) must take the plain-path fallback gate in
    _spec_discriminator and produce bitwise-identical scores."""
    from styletts2_tpu.models import discriminators as D

    msd = init_msd(jax.random.fold_in(KEY, 7))
    y = jax.random.normal(KEY, (2, 1, 4800)) * 0.1
    y_hat = jax.random.normal(jax.random.fold_in(KEY, 1), (2, 1, 4800)) * 0.1

    old_drop = D.DROP_NYQUIST
    D.DROP_NYQUIST = False
    try:
        D.set_spec_conv_impl("plain")
        rs0, gs0, _, _ = msd_apply(msd, y, y_hat)
        D.set_spec_conv_impl("packed")
        rs1, gs1, _, _ = msd_apply(msd, y, y_hat)
    finally:
        D.set_spec_conv_impl("auto")
        D.DROP_NYQUIST = old_drop
    for a, b in zip(rs0 + gs0, rs1 + gs1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mrstft_loss_zero_for_identical():
    wav = jax.random.normal(KEY, (2, 6000)) * 0.3
    loss = multi_resolution_stft_loss(wav, wav)
    assert float(loss) < 1e-6
    loss2 = multi_resolution_stft_loss(wav * 0.5, wav)
    assert float(loss2) > 0.01
