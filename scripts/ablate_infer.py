"""Component-level timing of the inference path (TPU ablation profile).

Same methodology as scripts/ablate_train.py (the jax.profiler cannot attach
through the axon tunnel): each stage of the bench.py pipeline is timed as
its own jit at the exact bench shapes, with chained scalar fetches so the
tunneled backend actually executes every iteration.

Usage: python scripts/ablate_infer.py [component ...]
Components: frontend synth decoder f0n text bert sampler all
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scalar(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return leaf.ravel()[0].astype("float32")


def _time(fn, *args, iters=10):
    out = fn(*args)
    _ = float(_scalar(out))
    best = None
    for _round in range(2):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            s = _scalar(out)
            acc = s if acc is None else acc + s
        _ = float(acc)
        best = (time.perf_counter() - t0) / iters * 1000.0
    return best


def main():
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from styletts2_tpu.config import ModelParams
    from styletts2_tpu.infer import InferenceEngine
    from styletts2_tpu.models.plbert import PLBertConfig
    from styletts2_tpu.models.zoo import build_zoo
    from styletts2_tpu.models.plbert import plbert_apply
    from styletts2_tpu.models.text_encoder import text_encoder_apply
    from styletts2_tpu.models.predictor import prosody_f0n_apply
    from styletts2_tpu.models.decoder import istftnet
    from styletts2_tpu.models.diffusion import sampler as S
    from styletts2_tpu.models.diffusion.denoiser import denoiser_cfg_apply
    from styletts2_tpu.ops.alignment import hard_alignment
    from styletts2_tpu.utils import cast_pytree

    which = set(sys.argv[1:]) or {"all"}

    def want(name):
        return "all" in which or name in which

    mp = ModelParams()
    plbert_cfg = PLBertConfig()
    zoo = jax.jit(lambda k: build_zoo(k, mp, plbert_cfg, include_slm=False))(
        jax.random.PRNGKey(0))
    engine = InferenceEngine(zoo, mp, plbert_cfg)
    platform = jax.devices()[0].platform
    if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" and platform == "tpu":
        engine.zoo = cast_pytree(engine.zoo, jnp.bfloat16)
        engine.compute_dtype = jnp.bfloat16
    zoo = engine.zoo

    b = int(os.environ.get("BENCH_BATCH", "16"))
    token_cap, frame_cap, steps = 64, 400, 5
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(4, 170, (b, token_cap)), dtype=jnp.int32)
    lengths = jnp.full((b,), token_cap, dtype=jnp.int32)
    noise = jnp.asarray(rng.standard_normal((b, 1, mp.style_dim * 2)).astype(np.float32))
    zeros = jnp.zeros((b, mp.style_dim * 2))
    key = jax.random.PRNGKey(0)

    results = {}

    frontend = engine._frontend_fn(token_cap, steps, 1.0, use_ref=False)
    t_en, d, s, ref, s_out, pred_dur = jax.block_until_ready(frontend(
        zoo, tokens, lengths, key, noise, zeros, zeros, jnp.float32(0.0)))
    pred_dur = jnp.minimum(pred_dur, frame_cap // token_cap)
    synth = engine._synth_fn(token_cap, frame_cap)

    if want("frontend"):
        results["frontend"] = _time(
            lambda z: frontend(z, tokens, lengths, key, noise, zeros, zeros,
                               jnp.float32(0.0)), zoo)
    if want("synth"):
        results["synth"] = _time(
            lambda z: synth(z, t_en, d, s, ref, pred_dur, lengths), zoo)

    if want("text"):
        results["text"] = _time(jax.jit(
            lambda z: text_encoder_apply(z["text_encoder"], tokens, lengths)), zoo)
    if want("bert"):
        mask = (jnp.arange(token_cap)[None, :] < lengths[:, None]).astype(jnp.int32)
        results["bert"] = _time(jax.jit(
            lambda z: plbert_apply(z["bert"], tokens, mask, plbert_cfg)), zoo)
    if want("sampler"):
        mask = jnp.arange(token_cap)[None, :] < lengths[:, None]
        bert_dur = jax.block_until_ready(jax.jit(
            lambda z: plbert_apply(z["bert"], tokens, mask.astype(jnp.int32),
                                   plbert_cfg))(zoo))

        def samp(z):
            def net(x, c_noise):
                return denoiser_cfg_apply(
                    z["diffusion"]["transformer"], x, c_noise, bert_dur,
                    embedding_scale=1.0, features=None,
                    num_heads=mp.diffusion.transformer.num_heads,
                    style_conditioned=False, mask=mask)
            fn = S.k_denoise_fn(net, 0.2)
            return S.adpm2_sample(key, noise, fn, S.karras_schedule(steps),
                                  steps, clamp=False)
        results["sampler"] = _time(jax.jit(samp), zoo)

    # synth internals at synth shapes
    token_mask = (jnp.arange(token_cap)[None, :] < lengths[:, None]).astype(jnp.float32)
    aln = hard_alignment(pred_dur, frame_cap, token_mask)
    if engine.compute_dtype is not None:
        aln = aln.astype(engine.compute_dtype)
        t_en_c, d_c, s_c, ref_c = (x.astype(engine.compute_dtype)
                                   for x in (t_en, d, s, ref))
    else:
        t_en_c, d_c, s_c, ref_c = t_en, d, s, ref
    en = jnp.swapaxes(d_c, 1, 2) @ aln
    asr = t_en_c @ aln
    frames = pred_dur.sum(axis=1)
    f0, n = jax.block_until_ready(jax.jit(
        lambda z: prosody_f0n_apply(z["predictor"], en, s_c, lengths=frames))(zoo))

    if want("f0n"):
        results["f0n"] = _time(jax.jit(
            lambda z: prosody_f0n_apply(z["predictor"], en, s_c, lengths=frames)), zoo)
    if want("decoder"):
        results["decoder"] = _time(jax.jit(
            lambda z: istftnet.decoder_apply(z["decoder"], mp.decoder, asr, f0,
                                             n, ref_c, lengths=frames)), zoo)

    audio_s = b * frame_cap * 600 / 24000.0
    print(json.dumps({"platform": platform, "batch": b,
                      "token_cap": token_cap, "frame_cap": frame_cap,
                      "audio_s": audio_s,
                      "ms": {k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
