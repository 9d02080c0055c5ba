"""Chained-rep conv probe: per-op cost INSIDE one compiled program.

Single-op jits through the tunneled backend are dispatch-dominated (~3-5 ms
floor regardless of FLOPs — see layout_probe.py results), so this probe
chains N dependent applications of the same op inside ONE jit and reports
(total / N).  That is the number that predicts fused-program behaviour.

Variants at the vocoder MRF hot shapes (batch 16):
  - dilated conv k3/k7/k11 as NCW conv, NWC conv, tap-matmul
  - the full AdaIN->Snake->conv round (current NCW implementation)
  - an elementwise roundtrip (leaky_relu) to price one HBM pass

Usage: python scripts/probe_chain.py [s0] [s1]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 12


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
    return last / REPS  # per-rep ms


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    dt = jnp.bfloat16
    b = int(os.environ.get("BENCH_BATCH", "16"))
    rng = np.random.default_rng(0)
    results = {}
    which = set(sys.argv[1:]) or {"s0", "s1"}

    shapes = {"s0": (256, 8000), "s1": (128, 48000)}
    for name in sorted(which & set(shapes)):
        c, t = shapes[name]
        x = jnp.asarray(rng.standard_normal((b, c, t)), dt)
        xl = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        for k, d in ((3, 1), (7, 3), (11, 5)):
            w = jnp.asarray(rng.standard_normal((c, c, k)) * (0.3 / (k * c) ** 0.5), dt)
            wt = jnp.transpose(w, (2, 1, 0))  # (K, C_in, C_out)
            pad = (k * d - d) // 2

            def ncw(x, w=w, d=d, pad=pad):
                for _ in range(REPS):
                    x = lax.conv_general_dilated(
                        x, w, window_strides=(1,), padding=((pad, pad),),
                        rhs_dilation=(d,), dimension_numbers=("NCH", "OIH", "NCH"))
                return x

            def nwc(x, wt=wt, d=d, pad=pad):
                w2 = jnp.transpose(wt, (0, 1, 2))  # (K, I, O) == "HIO"
                for _ in range(REPS):
                    x = lax.conv_general_dilated(
                        x, w2, window_strides=(1,), padding=((pad, pad),),
                        rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"))
                return x

            def tapmm(x, wt=wt, k=k, d=d, pad=pad, t=t):
                for _ in range(REPS):
                    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
                    acc = None
                    for i in range(k):
                        part = xp[:, i * d: i * d + t, :] @ wt[i]
                        acc = part if acc is None else acc + part
                    x = acc
                return x

            results[f"{name}_k{k}d{d}_ncw"] = _time(jax.jit(ncw), x)
            results[f"{name}_k{k}d{d}_nwc"] = _time(jax.jit(nwc), xl)
            results[f"{name}_k{k}d{d}_tapmm"] = _time(jax.jit(tapmm), xl)

        # one elementwise HBM roundtrip
        def ew(x):
            for _ in range(REPS):
                x = jnp.where(x >= 0, x, 0.1 * x) + 1e-6
            return x

        results[f"{name}_elementwise"] = _time(jax.jit(ew), x)

        # full AdaIN->Snake->conv round at these shapes (NCW, current impl)
        from styletts2_tpu.models import common as cm
        from styletts2_tpu.ops.fused import adain_snake

        kround, dround = 7, 3
        padr = (kround * dround - dround) // 2
        s = jnp.asarray(rng.standard_normal((b, 128)), dt)
        adain_p = {"fc": {"weight": jnp.asarray(
            rng.standard_normal((2 * c, 128)) * 0.05, dt),
            "bias": jnp.asarray(np.zeros(2 * c), dt)}}
        alpha = jnp.ones((1, c, 1), dt)
        wv = jnp.asarray(rng.standard_normal((c, c, kround)) * 0.01, dt)
        conv_p = {"weight_v": wv,
                  "weight_g": jnp.asarray(np.ones((c, 1, 1)), dt),
                  "bias": jnp.asarray(np.zeros(c), dt)}

        def round_(x, s):
            from styletts2_tpu.nn.conv import conv1d
            from styletts2_tpu.nn.param_norm import weight_norm_kernel
            for _ in range(REPS):
                h = adain_snake(adain_p, x, s, alpha)
                x = conv1d(h, weight_norm_kernel(conv_p), conv_p["bias"],
                           padding=padr, dilation=dround)
            return x

        results[f"{name}_adain_snake_conv_k7"] = _time(jax.jit(round_), x, s)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
