"""Decompose the harmonic-source component cost (round-5: src measured
144 ms of the 733 ms batch-128 call even after the mel-rate sine bank).

Components (chained inside one jit, per-rep ms):
  sine     source_module_apply_mel -> har (B, T, 1)
  stft     stft_mag_phase(har) alone (n_fft 20, hop 5)
  interp   phase upsample + sin2pi only, (B, 9, T)
  ew9      one (B, 9, T) f32 elementwise roundtrip
  ew1      one (B, T) f32 elementwise roundtrip
  full     sine + stft (the ablate_decoder 'src' component)

Usage: python scripts/probe_src.py    (BENCH_BATCH=128)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROBE_REPS", "4"))


def _time(fn, *args, iters=5):
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.ravel()[0].astype("float32"))
    last = None
    for _round in range(2):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype("float32")
            acc = s if acc is None else acc + s
        _ = float(acc)
        last = (time.perf_counter() - t0) / iters * 1000.0
    return last / REPS


def main():
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from styletts2_tpu.audio.stft import stft_mag_phase
    from styletts2_tpu.models.decoder.source import (
        init_source_module, source_module_apply_mel)
    from styletts2_tpu.nn.activations import sin2pi
    from styletts2_tpu.nn.conv import interpolate_linear

    b = int(os.environ.get("BENCH_BATCH", "128"))
    t_mel = 800
    u = 300
    t_audio = t_mel * u
    rng = np.random.default_rng(0)
    p = init_source_module(jax.random.PRNGKey(0))
    f0 = jnp.abs(jnp.asarray(rng.standard_normal((b, t_mel)), jnp.float32)) * 100
    har0 = jnp.asarray(rng.standard_normal((b, t_audio)) * 0.1, jnp.float32)
    turns_lo = jnp.asarray(np.cumsum(
        rng.random((b, 9, t_mel)), axis=-1), jnp.float32)

    results = {}

    def sine(f0):
        out = None
        for i in range(REPS):
            h, _, _ = source_module_apply_mel(p, None, f0 + i, u,
                                              deterministic=True)
            out = h if out is None else out + h
        return out

    def stft_only(har):
        for _ in range(REPS):
            sp, ph = stft_mag_phase(har, 20, 5, 20)
            har = har + sp[:, 0, 0][:, None] * 1e-6
        return har

    def interp(tl):
        out = None
        for i in range(REPS):
            t = interpolate_linear(tl * u + i, scale_factor=float(u))
            s = sin2pi(t)
            out = s[..., ::301].sum() if out is None else out + s[..., ::301].sum()
        return out

    def ew9(x):
        for _ in range(REPS):
            x = jnp.where(x >= 0, x, 0.1 * x) + 1e-6
        return x

    def ew1(x):
        for _ in range(REPS):
            x = jnp.where(x >= 0, x, 0.1 * x) + 1e-6
        return x

    def full(f0):
        out = None
        for i in range(REPS):
            h, _, _ = source_module_apply_mel(p, None, f0 + i, u,
                                              deterministic=True)
            sp, ph = stft_mag_phase(h[..., 0], 20, 5, 20)
            v = sp[:, 0, 0] + ph[:, 0, 0]
            out = v if out is None else out + v
        return out

    x9 = jnp.asarray(rng.standard_normal((b, 9, t_audio)), jnp.float32)
    for name, fn, arg in (("sine", sine, f0), ("stft", stft_only, har0),
                          ("interp", interp, turns_lo),
                          ("ew9", ew9, x9), ("ew1", ew1, har0),
                          ("full", full, f0)):
        results[name] = _time(jax.jit(fn), arg)
        print(f"{name:8s} {results[name]:8.2f} ms/rep", flush=True)


if __name__ == "__main__":
    main()
