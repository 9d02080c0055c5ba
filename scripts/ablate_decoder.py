"""Stage-level timing inside the iSTFTNet decoder (the 213 ms of the 214 ms
inference call, per scripts/ablate_infer.py).

Each sub-graph is one jit at the real bench shapes (batch 16, T_en=400), so
the ~4 ms tunnel dispatch floor is amortized across a whole stage rather
than a single conv.  Components:

  enc     decoder AdainResBlk1d encode/decode stack (1024ch @ T 400-800)
  src     harmonic source: F0 upsample + SineGen + STFT (audio rate, 240k)
  mrf0    upsample stage 0: transpose conv + noise path + 3 MRF resblocks
          (256 ch @ T 8000)
  mrf1    upsample stage 1: same at 128 ch @ T 48000
  post    conv_post + exp/sin + iSTFT head

Usage: python scripts/ablate_decoder.py [component ...]
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
        # second-window methodology: report the LAST window, not a min —
        # the first window after a fresh compile pays allocator reorganization
        last = (time.perf_counter() - t0) / iters * 1000.0
    return last


def main():
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from styletts2_tpu.audio.stft import stft_mag_phase, istft_from_mag_phase
    from styletts2_tpu.config import ModelParams
    from styletts2_tpu.models import common as cm
    from styletts2_tpu.models.adain_blocks import adain_resblk1d_apply
    from styletts2_tpu.models.decoder.istftnet import init_decoder
    from styletts2_tpu.models.decoder.resblock import adain_resblock1_apply
    from styletts2_tpu.models.decoder.source import source_module_apply
    from styletts2_tpu.nn.conv import conv1d, conv_transpose1d
    from styletts2_tpu.nn.param_norm import weight_norm_kernel
    from styletts2_tpu.utils import cast_pytree

    which = set(sys.argv[1:]) or {"all"}

    def want(name):
        return "all" in which or name in which

    mp = ModelParams()
    cfg = mp.decoder
    dt = jnp.bfloat16
    b = int(os.environ.get("BENCH_BATCH", "16"))
    t_en = 400
    t_mel = 2 * t_en
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

    upsample_scale = 60 * cfg.gen_istft_hop_size
    t_audio_src = t_en * 2 * upsample_scale

    if want("src"):
        f0c = jnp.abs(jnp.asarray(rng.standard_normal((b, t_mel)), dt)) * 100

        def src(p, f0):
            f0_up = jnp.repeat(f0[:, None, :], upsample_scale, axis=-1)
            f0_up = jnp.swapaxes(f0_up.reshape(f0.shape[0], 1, -1), 1, 2)
            har_source, _, _ = source_module_apply(
                p["m_source"], None, f0_up, upsample_scale, deterministic=True)
            har = har_source[..., 0]
            har_spec, har_phase = stft_mag_phase(
                har, cfg.gen_istft_n_fft, cfg.gen_istft_hop_size, cfg.gen_istft_n_fft)
            return jnp.concatenate([har_spec, har_phase], axis=1)

        results["src"] = _time(jax.jit(src), gen, f0c)

    har = jnp.asarray(rng.standard_normal((b, cfg.gen_istft_n_fft + 2,
                                           t_audio_src // cfg.gen_istft_hop_size + 1)), dt)

    def stage(p, x, har, s, i):
        rates = cfg.upsample_rates
        x = cm.leaky_relu(x, 0.1)
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
        x = conv_transpose1d(x, weight_norm_kernel(up), up.get("bias"),
                             stride=u, padding=(k - u) // 2)
        if i == len(rates) - 1:
            x = jnp.concatenate([x[..., 1:2], x], axis=-1)
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

    if want("mrf0"):
        x0 = jnp.asarray(rng.standard_normal((b, 512, t_mel)), dt)
        results["mrf0"] = _time(jax.jit(lambda p, x, h, s: stage(p, x, h, s, 0)),
                                gen, x0, har, s)
    if want("mrf1"):
        x1 = jnp.asarray(rng.standard_normal((b, 256, t_mel * 10)), dt)
        results["mrf1"] = _time(jax.jit(lambda p, x, h, s: stage(p, x, h, s, 1)),
                                gen, x1, har, s)

    if want("post"):
        n_fft, hop = cfg.gen_istft_n_fft, cfg.gen_istft_hop_size
        xp = jnp.asarray(rng.standard_normal((b, 128, t_mel * 60)), dt)

        def post(p, x):
            x = cm.leaky_relu(x, 0.01)
            x = cm.wn_conv1d(p["conv_post"], x, padding=3)
            spec = jnp.exp(x[:, : n_fft // 2 + 1, :])
            phase = jnp.sin(x[:, n_fft // 2 + 1:, :])
            return istft_from_mag_phase(spec, phase, n_fft, hop, n_fft)

        results["post"] = _time(jax.jit(post), gen, xp)

    print(json.dumps({"batch": b, "ms": {k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
