"""In-tree native FLAC decoder tests (native/flac_decoder.cpp) against the
pure-python fixture encoder (flac_tools.py)."""

import numpy as np
import pytest

from flac_tools import encode_flac


def _native_or_skip():
    from styletts2_tpu import native

    lib = native._load()
    if lib is None or not hasattr(lib, "flac_decode"):
        pytest.skip("native library unavailable")
    return native


def _roundtrip(tmp_path, samples, sr=24000, **kw):
    native = _native_or_skip()
    p = tmp_path / "x.flac"
    p.write_bytes(encode_flac(samples, sr, **kw))
    wave, got_sr = native.read_flac(str(p))
    assert got_sr == sr
    mono = samples if samples.ndim == 1 else samples[:, 0]
    np.testing.assert_allclose(wave, mono.astype(np.float32) / 32768.0,
                               atol=1e-7)


def _sig(n, seed=0, amp=12000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * 220 * t / 24000)
    x += rng.normal(0, 200, n)
    return np.clip(x, -32768, 32767).astype(np.int16)


def test_verbatim_mono(tmp_path):
    _roundtrip(tmp_path, _sig(10000))


def test_verbatim_multiframe(tmp_path):
    _roundtrip(tmp_path, _sig(9000), blocksize=2048)


def test_constant_mono(tmp_path):
    _roundtrip(tmp_path, np.full(5000, -123, np.int16), subframe="constant")


def test_fixed_order2_rice(tmp_path):
    _roundtrip(tmp_path, _sig(8192, seed=3), subframe="fixed2")


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_stereo_modes(tmp_path, mode):
    l = _sig(6000, seed=1)
    r = _sig(6000, seed=2, amp=8000)
    _roundtrip(tmp_path, np.stack([l, r], 1), stereo_mode=mode)


def test_stereo_fixed_rice_mid_side(tmp_path):
    l = _sig(6000, seed=4)
    r = (l.astype(np.int32) // 2 + _sig(6000, seed=5, amp=300)).astype(np.int16)
    _roundtrip(tmp_path, np.stack([l, r], 1), subframe="fixed2",
               stereo_mode="mid_side")


def test_unknown_total_samples(tmp_path):
    _roundtrip(tmp_path, _sig(7000), total_in_streaminfo=False)


def test_truncated_file_raises(tmp_path):
    native = _native_or_skip()
    data = encode_flac(_sig(4096), 24000)
    p = tmp_path / "t.flac"
    p.write_bytes(data[:30])
    with pytest.raises(RuntimeError):
        native.read_flac(str(p))


def test_dataset_reads_flac(tmp_path):
    _native_or_skip()
    from styletts2_tpu.data.dataset import _read_audio

    p = tmp_path / "utt.flac"
    sig = _sig(24000)
    p.write_bytes(encode_flac(sig, 24000))
    wave, sr = _read_audio(str(p))
    assert sr == 24000
    np.testing.assert_allclose(wave, sig.astype(np.float32) / 32768.0, atol=1e-7)


def test_ogg_and_mp3_error_cleanly_on_garbage(tmp_path):
    """The ctypes system-codec paths must fail with UnreadableAudioError (not
    crash) on corrupt streams, feeding the loader's skip loop."""
    from styletts2_tpu.data.dataset import UnreadableAudioError, _read_audio

    ogg = tmp_path / "bad.ogg"
    ogg.write_bytes(b"OggS" + b"\x00" * 64)
    with pytest.raises(UnreadableAudioError):
        _read_audio(str(ogg))

    mp3 = tmp_path / "bad.mp3"
    mp3.write_bytes(b"ID3" + b"\x00" * 64)
    with pytest.raises(UnreadableAudioError):
        _read_audio(str(mp3))
