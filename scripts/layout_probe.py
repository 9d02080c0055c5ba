"""Micro-probe: conv1d layout A/B at the vocoder MRF shapes.

Times the dominant generator convs (stage-0: C=256 @ T=8000, stage-1:
C=128 @ T=48000, batch 16, k=3/7/11 with dilation) as NCW (current
`nn.conv.conv1d`) vs channels-last NWC, plus the conv_transpose upsamplers,
with the tunneled-backend methodology (chained scalar fetch, second window).

Usage: python scripts/layout_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=10):
    import jax

    out = fn(*args)
    _ = float(out.ravel()[0].astype("float32"))
    last = None
    for _round in range(2):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            s = out.ravel()[0].astype("float32")
            acc = s if acc is None else acc + s
        _ = float(acc)
        # second-window methodology: report the LAST window, not a min —
        # the first window after a fresh compile pays allocator reorganization
        last = (time.perf_counter() - t0) / iters * 1000.0
    return last


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

    for name, (c, t) in {"s0_c256_t8000": (256, 8000),
                         "s1_c128_t48000": (128, 48000)}.items():
        x = jnp.asarray(rng.standard_normal((b, c, t)), dt)
        xl = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        for k, d in ((3, 1), (7, 3), (11, 5)):
            w = jnp.asarray(rng.standard_normal((c, c, k)) * 0.02, dt)
            pad = (k * d - d) // 2

            def ncw(x, w=w, d=d, pad=pad):
                return lax.conv_general_dilated(
                    x, w, window_strides=(1,), padding=((pad, pad),),
                    rhs_dilation=(d,), dimension_numbers=("NCH", "OIH", "NCH"))

            def nwc(x, w=w, d=d, pad=pad):
                return lax.conv_general_dilated(
                    x, jnp.transpose(w, (2, 1, 0)), window_strides=(1,),
                    padding=((pad, pad),), rhs_dilation=(d,),
                    dimension_numbers=("NHC", "HIO", "NHC"))

            def tapmm(x, w=w, k=k, d=d, pad=pad, t=t, c=c):
                # K shifted (B*T, C) @ (C, C) matmuls, accumulated — the
                # conv as explicit MXU work with no im2col materialization
                wt = jnp.transpose(w, (2, 1, 0))  # (K, C_in, C_out)
                xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
                acc = None
                for i in range(k):
                    part = xp[:, i * d: i * d + t, :] @ wt[i]
                    acc = part if acc is None else acc + part
                return acc

            def im2col(x, w=w, k=k, d=d, pad=pad, t=t, c=c):
                wt = jnp.transpose(w, (2, 1, 0)).reshape(k * c, c)
                xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
                taps = [xp[:, i * d: i * d + t, :] for i in range(k)]
                xc = jnp.concatenate(taps, axis=-1)  # (B, T, K*C)
                return xc @ wt

            results[f"{name}_k{k}d{d}_ncw"] = _time(jax.jit(ncw), x)
            results[f"{name}_k{k}d{d}_nwc"] = _time(jax.jit(nwc), xl)
            results[f"{name}_k{k}d{d}_tapmm"] = _time(jax.jit(tapmm), xl)
            results[f"{name}_k{k}d{d}_im2col"] = _time(jax.jit(im2col), xl)

    # conv_transpose upsamplers (512->256 stride 10 k20 @800; 256->128 s6 k12 @8000)
    for name, (ci, co, s_, k, t) in {
            "up0": (512, 256, 10, 20, 800), "up1": (256, 128, 6, 12, 8000)}.items():
        x = jnp.asarray(rng.standard_normal((b, ci, t)), dt)
        xl = jnp.swapaxes(x, 1, 2)
        w = jnp.asarray(rng.standard_normal((co, ci, k)) * 0.02, dt)  # flipped/swapped form
        pad = (k - s_) // 2
        pad_lo = k - 1 - pad

        def ncw_t(x, w=w, s_=s_, pad_lo=pad_lo):
            return lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=((pad_lo, pad_lo),),
                lhs_dilation=(s_,), dimension_numbers=("NCH", "OIH", "NCH"))

        def nwc_t(x, w=w, s_=s_, pad_lo=pad_lo):
            return lax.conv_general_dilated(
                x, jnp.transpose(w, (2, 1, 0)), window_strides=(1,),
                padding=((pad_lo, pad_lo),), lhs_dilation=(s_,),
                dimension_numbers=("NHC", "HIO", "NHC"))

        # subpixel: gather the weight's stride-u phases into one dense
        # (nm*Ci, u*Co) matrix; y[to*u+r] = sum_m x[to+m] w[pad_lo-r+m*u]
        # (w here is the pre-flipped lax form the ncw_t variant consumes)
        import math as _math
        wn = np.asarray(w, np.float64)  # (co, ci, k)
        m_lo = _math.ceil(-pad_lo / s_)
        m_hi = (k - 1 - pad_lo + s_ - 1) // s_
        nm = m_hi - m_lo + 1
        W = np.zeros((nm, ci, s_, co), np.float64)
        for r in range(s_):
            for mi, m in enumerate(range(m_lo, m_hi + 1)):
                tap = pad_lo - r + m * s_
                if 0 <= tap < k:
                    W[mi, :, r, :] = wn[:, :, tap].T
        Wj = jnp.asarray(W.reshape(nm * ci, s_ * co), dt)

        def subpix(x, W=Wj, nm=nm, m_lo=m_lo, m_hi=m_hi, t=t, s_=s_, co=co):
            xp = jnp.pad(x, ((0, 0), (-m_lo, m_hi), (0, 0)))
            taps = [xp[:, mi: mi + t, :] for mi in range(nm)]
            xc = jnp.concatenate(taps, axis=-1)           # (B, T, nm*Ci)
            y = xc @ W                                     # (B, T, u*Co)
            return y.reshape(y.shape[0], t * s_, co)

        err = float(jnp.max(jnp.abs(
            subpix(xl[:1]) - jnp.swapaxes(ncw_t(x[:1]), 1, 2))).astype(jnp.float32))
        results[f"{name}_subpix_maxerr"] = err

        results[f"{name}_ncw"] = _time(jax.jit(ncw_t), x)
        results[f"{name}_nwc"] = _time(jax.jit(nwc_t), xl)
        results[f"{name}_subpix"] = _time(jax.jit(subpix), xl)

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
