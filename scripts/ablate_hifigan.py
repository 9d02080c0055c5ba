"""Stage-level timing inside the HiFi-GAN generator (the LibriTTS-flagship
decoder, 341 audio-s/s vs iSTFTNet's ~1035 at batch 16 — VERDICT round-4
item 3: find where the 3x actually goes).

Components (production code paths, including the TPU folded/subpixel conv
forms):

  enc     decoder AdainResBlk1d encode/decode stack (1024ch @ T 400-800)
  src     harmonic source: F0 upsample + SineGen (audio rate 240k, no STFT)
  st0     upsample stage 0: snake + noise path + up k20/s10 + 3 MRF (C=256 @ 8k)
  st1     stage 1: up k10/s5 + MRF (C=128 @ 40k)
  st2     stage 2: up k6/s3  + MRF (C=64  @ 120k)
  st3     stage 3: up k4/s2  + MRF (C=32  @ 240k)
  post    snake + conv_post k7 + tanh (C=32 @ 240k)

Usage: python scripts/ablate_hifigan.py [component ...]   (BENCH_BATCH=16)
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
    return last


def main():
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from styletts2_tpu.config import DecoderConfig
    from styletts2_tpu.models import common as cm
    from styletts2_tpu.models.adain_blocks import adain_resblk1d_apply
    from styletts2_tpu.models.decoder.hifigan import init_decoder
    from styletts2_tpu.models.decoder.resblock import adain_resblock1_apply
    from styletts2_tpu.models.decoder.source import source_module_apply_mel
    from styletts2_tpu.nn.activations import snake
    from styletts2_tpu.nn.conv import (conv1d, conv_transpose1d,
                                       conv_transpose1d_subpixel,
                                       mxu_conv_forms)
    from styletts2_tpu.nn.param_norm import weight_norm_kernel
    from styletts2_tpu.utils import cast_pytree

    which = set(sys.argv[1:]) or {"all"}

    def want(name):
        return "all" in which or name in which

    cfg = DecoderConfig(type="hifigan", upsample_rates=(10, 5, 3, 2),
                        upsample_kernel_sizes=(20, 10, 6, 4))
    dt = jnp.bfloat16
    b = int(os.environ.get("BENCH_BATCH", "16"))
    t_en = 400
    t_mel = 2 * t_en
    rates = cfg.upsample_rates
    rng = np.random.default_rng(0)

    params = cast_pytree(
        jax.jit(lambda k: init_decoder(k, cfg))(jax.random.PRNGKey(0)), dt)
    gen = params["generator"]

    s = jnp.asarray(rng.standard_normal((b, 128)), dt)
    results = {}

    if want("enc"):
        asr = jnp.asarray(rng.standard_normal((b, 512, t_en)), dt)
        f0c = jnp.asarray(rng.standard_normal((b, t_mel)), dt)
        nc_ = jnp.asarray(rng.standard_normal((b, t_mel)), dt)

        def enc(p, asr, f0_curve, n_curve, s):
            f0 = cm.wn_conv1d(p["F0_conv"], f0_curve[:, None, :], stride=2, padding=1)
            n = cm.wn_conv1d(p["N_conv"], n_curve[:, None, :], stride=2, padding=1)
            x = jnp.concatenate([asr, f0, n], axis=1)
            x = adain_resblk1d_apply(p["encode"], x, s)
            asr_res = cm.wn_conv1d(p["asr_res"]["0"], asr)
            res = True
            for i in range(4):
                if res:
                    x = jnp.concatenate([x, asr_res, f0, n], axis=1)
                x = adain_resblk1d_apply(p["decode"][str(i)], x, s, upsample=i == 3)
                if i == 3:
                    res = False
            return x

        results["enc"] = _time(jax.jit(enc), params, asr, f0c, nc_, s)

    upsample_scale = 1
    for r_ in rates:
        upsample_scale *= r_
    t_audio = t_mel * upsample_scale

    if want("src"):
        f0c = jnp.abs(jnp.asarray(rng.standard_normal((b, t_mel)), dt)) * 100

        def src(p, f0):
            har_source, _, _ = source_module_apply_mel(
                p["m_source"], None, f0, upsample_scale, deterministic=True)
            return jnp.swapaxes(har_source, 1, 2)

        results["src"] = _time(jax.jit(src), gen, f0c)

    har = jnp.asarray(rng.standard_normal((b, 1, t_audio)), dt)

    def stage(p, x, har, s, i):
        x = snake(x, p["alphas"][str(i)])
        nc = p["noise_convs"][str(i)]
        if i + 1 < len(rates):
            stride_f0 = 1
            for r_ in rates[i + 1:]:
                stride_f0 *= r_
            x_source = conv1d(har, nc["weight"], nc["bias"], stride=stride_f0,
                              padding=(stride_f0 + 1) // 2)
            nres_k = 7
        else:
            x_source = conv1d(har, nc["weight"], nc["bias"])
            nres_k = 11
        x_source = adain_resblock1_apply(p["noise_res"][str(i)], x_source, s,
                                         nres_k, (1, 3, 5))
        up = p["ups"][str(i)]
        u, k = rates[i], cfg.upsample_kernel_sizes[i]
        up_fn = (conv_transpose1d_subpixel if k == 2 * u and mxu_conv_forms()
                 else conv_transpose1d)
        x = up_fn(x, weight_norm_kernel(up), up.get("bias"),
                  stride=u, padding=u // 2 + u % 2, output_padding=u % 2)
        x_source = x_source[..., : x.shape[-1]]
        if x_source.shape[-1] < x.shape[-1]:
            x_source = jnp.pad(x_source, ((0, 0), (0, 0),
                                          (0, x.shape[-1] - x_source.shape[-1])))
        x = x + x_source
        xs = None
        nk = len(cfg.resblock_kernel_sizes)
        for j in range(nk):
            r = adain_resblock1_apply(p["resblocks"][str(i * nk + j)], x, s,
                                      cfg.resblock_kernel_sizes[j],
                                      cfg.resblock_dilation_sizes[j])
            xs = r if xs is None else xs + r
        return xs / nk

    t_in = t_mel
    for i in range(4):
        c_in = 512 // (2 ** i)
        if want(f"st{i}"):
            xi = jnp.asarray(rng.standard_normal((b, c_in, t_in)), dt)
            results[f"st{i}"] = _time(
                jax.jit(lambda p, x, h, s, i=i: stage(p, x, h, s, i)),
                gen, xi, har, s)
        t_in *= rates[i]

    if want("post"):
        xp = jnp.asarray(rng.standard_normal((b, 32, t_audio)), dt)

        def post(p, x):
            x = snake(x, p["alphas"][str(len(rates))])
            x = cm.wn_conv1d(p["conv_post"], x, padding=3)
            return jnp.tanh(x)

        results["post"] = _time(jax.jit(post), gen, xp)

    print(json.dumps({"batch": b, "ms": {k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
