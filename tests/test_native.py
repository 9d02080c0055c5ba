"""Native C++ host-runtime bindings (graceful fallback when unbuilt)."""

import numpy as np

import jax.numpy as jnp

from styletts2_tpu.native import available, maximum_path_host, resample_host
from styletts2_tpu.ops.monotonic import maximum_path
from styletts2_tpu.audio.resample import resample


def test_native_maximum_path_matches_device_dp():
    rng = np.random.default_rng(0)
    b, tt, tm = 3, 11, 17
    vals = rng.standard_normal((b, tt, tm)).astype(np.float32)
    tx = np.array([11, 6, 9], np.int32)
    ty = np.array([17, 12, 9], np.int32)
    got = maximum_path_host(vals, tx, ty)
    want = np.asarray(maximum_path(jnp.asarray(vals), jnp.asarray(tx),
                                   jnp.asarray(ty))).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_native_resample_matches_jax():
    t = np.arange(24000) / 24000.0
    sine = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample_host(sine, 24000, 16000)
    assert len(out) == 16000
    ref = np.asarray(resample(jnp.asarray(sine[None]), 24000, 16000))[0]
    np.testing.assert_allclose(out, ref, atol=1e-4)
