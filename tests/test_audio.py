import numpy as np
import pytest
import torch

import jax.numpy as jnp

from styletts2_tpu.audio import stft as jstft
from styletts2_tpu.audio.stft import istft as jistft, istft_from_mag_phase, stft_mag_phase
from styletts2_tpu.audio import mel as jmel


@pytest.mark.parametrize(
    "n_fft,hop,win",
    [(2048, 300, 1200), (1024, 120, 600), (512, 50, 240), (20, 5, 20), (400, 160, 400)],
)
def test_stft_matches_torch(n_fft, hop, win):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    ours = np.asarray(jstft(jnp.asarray(x), n_fft, hop, win))
    theirs = torch.stft(
        torch.from_numpy(x), n_fft, hop, win,
        window=torch.hann_window(win), return_complex=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop,win", [(20, 5, 20), (1024, 256, 1024)])
def test_istft_matches_torch(n_fft, hop, win):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 2000)).astype(np.float32)
    spec = torch.stft(
        torch.from_numpy(x), n_fft, hop, win,
        window=torch.hann_window(win), return_complex=True,
    )
    theirs = torch.istft(spec, n_fft, hop, win, window=torch.hann_window(win)).numpy()
    ours = np.asarray(jistft(jnp.asarray(spec.numpy()), n_fft, hop, win))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_mag_phase_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 1000)).astype(np.float32)
    mag, phase = stft_mag_phase(jnp.asarray(x), 20, 5, 20)
    y = istft_from_mag_phase(mag, phase, 20, 5, 20)
    # Perfect reconstruction away from edges
    np.testing.assert_allclose(np.asarray(y)[:, 20:-20], x[:, 20:-20], atol=1e-4)


def test_mel_pipeline_matches_torch_composition():
    """Full log-mel vs a torch composition (torch.stft + same-formula fbank).

    torchaudio is unavailable in this image; torch.stft is the trusted core.
    The fbank formula is validated separately for structural properties.
    """
    rng = np.random.default_rng(3)
    wave = rng.standard_normal(24000).astype(np.float32)
    cfg = jmel.DATASET_MEL
    ours = np.asarray(jmel.log_mel_spectrogram(jnp.asarray(wave), cfg))

    spec = torch.stft(
        torch.from_numpy(wave), cfg.n_fft, cfg.hop_length, cfg.win_length,
        window=torch.hann_window(cfg.win_length), return_complex=True,
    )
    power = spec.abs() ** 2
    fb = torch.from_numpy(np.asarray(jmel.melscale_fbanks(1025, 0.0, 8000.0, 80, 16000)))
    mel = torch.matmul(power.transpose(0, 1), fb).transpose(0, 1)
    theirs = ((torch.log(1e-5 + mel) + 4.0) / 4.0).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_fbank_structure():
    fb = np.asarray(jmel.melscale_fbanks(1025, 0.0, 8000.0, 80, 16000))
    assert fb.shape == (1025, 80)
    assert (fb >= 0).all()
    # Every filter has support, peaks are ordered in frequency
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) > 0).all()
    assert fb.max() <= 1.0 + 1e-6


def test_log_norm_matches_reference_math():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 80, 17)).astype(np.float32)
    ours = np.asarray(jmel.log_norm(jnp.asarray(x)))
    xt = torch.from_numpy(x)
    theirs = torch.log(torch.exp(xt * 4 + (-4)).norm(dim=1)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_matmul_dft_matches_fft():
    """The TPU matmul-DFT path must match the FFT path (used on CPU/tests).

    On TPU the MXU matmul basis replaces XLA's slow Fft HLO
    (audio/stft.py::set_dft_impl); both paths share all framing/window code,
    so matching rfft/irfft here proves the whole stft/istft pair."""
    import numpy as np

    import importlib

    st = importlib.import_module("styletts2_tpu.audio.stft")

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 4410)).astype(np.float32)
    for n_fft, hop, win in ((1024, 120, 600), (512, 50, 240), (20, 5, 20)):
        st.set_dft_impl("fft")
        ref_spec = np.asarray(st.stft(x, n_fft, hop, win))
        ref_wav = np.asarray(st.istft(ref_spec, n_fft, hop, win))
        st.set_dft_impl("matmul")
        try:
            got_spec = np.asarray(st.stft(x, n_fft, hop, win))
            got_wav = np.asarray(st.istft(got_spec, n_fft, hop, win))
        finally:
            st.set_dft_impl("auto")
        np.testing.assert_allclose(got_spec.real, ref_spec.real, atol=2e-4)
        np.testing.assert_allclose(got_spec.imag, ref_spec.imag, atol=2e-4)
        np.testing.assert_allclose(got_wav, ref_wav, atol=2e-4)


def test_small_fft_conv_path_matches_fft():
    """The conv-form STFT/iSTFT fast path (small divisible n_fft — the
    vocoder head's 20/5) vs the framed FFT path: same sums as one strided
    conv / conv_transpose, round-5 fix for the (B, n_frames, 20) lane-padded
    frames tensor that cost ~115 ms of the batch-128 call."""
    import importlib

    st = importlib.import_module("styletts2_tpu.audio.stft")

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 2400)).astype(np.float32) * 0.3
    for n_fft, hop in ((20, 5), (16, 4)):
        st.set_dft_impl("fft")          # conv path off: framed FFT reference
        mag_r, ph_r = (np.asarray(a) for a in
                       st.stft_mag_phase(x, n_fft, hop, n_fft))
        wav_r = np.asarray(st.istft_from_mag_phase(
            jnp.asarray(mag_r), jnp.asarray(ph_r), n_fft, hop, n_fft))
        st.set_dft_impl("matmul")       # conv path on (matmul-DFT family)
        try:
            mag_c, ph_c = (np.asarray(a) for a in
                           st.stft_mag_phase(x, n_fft, hop, n_fft))
            wav_c = np.asarray(st.istft_from_mag_phase(
                jnp.asarray(mag_r), jnp.asarray(ph_r), n_fft, hop, n_fft))
        finally:
            st.set_dft_impl("auto")
        np.testing.assert_allclose(mag_c, mag_r, atol=2e-4)
        # phase is compared through re/im (atan2 of near-zero bins is
        # legitimately unstable where magnitude ~ 0)
        np.testing.assert_allclose(mag_c * np.cos(ph_c), mag_r * np.cos(ph_r),
                                   atol=2e-4)
        np.testing.assert_allclose(mag_c * np.sin(ph_c), mag_r * np.sin(ph_r),
                                   atol=2e-4)
        np.testing.assert_allclose(wav_c, wav_r, atol=2e-4)


@pytest.mark.parametrize("n_fft,hop", [(1024, 120), (512, 50), (400, 160), (64, 16)])
def test_frame_signal_vjp_is_overlap_add(n_fft, hop):
    """frame_signal's custom VJP (dense OLA, any hop) vs explicit slicing."""
    import jax

    from styletts2_tpu.audio.stft import frame_signal

    t = 3 * n_fft + 7 * hop
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, t)),
                    jnp.float32)
    n_frames = 1 + (t - n_fft) // hop
    scale = jnp.arange(n_fft, dtype=jnp.float32)

    def loss(x):
        return jnp.sum(jnp.square(frame_signal(x, n_fft, hop)) * scale)

    def loss_ref(x):
        f = jnp.stack([x[..., i * hop: i * hop + n_fft]
                       for i in range(n_frames)], axis=-2)
        return jnp.sum(jnp.square(f) * scale)

    np.testing.assert_allclose(jax.grad(loss)(x), jax.grad(loss_ref)(x),
                               atol=1e-5, rtol=1e-5)
