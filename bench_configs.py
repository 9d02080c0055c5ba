"""BASELINE config sweep: driver-verifiable throughput for every inference
configuration BASELINE.md lists beyond the flagship bench.py run.

Covers (BASELINE.md "Configs to cover"):
  - LJSpeech/iSTFTNet diffusion-steps sweep 3/5/10
  - embedding_scale=2 classifier-free guidance
  - LJSpeech/HiFi-GAN decoder
  - LibriTTS zero-shot multispeaker batched path (style conditioning via
    ``ref_s``, the Demo/Inference_LibriTTS.ipynb cell 5/16 path)

Prints one JSON line per config: {"config": ..., "audio_s_per_s": N, ...}.
Select a subset with BENCH_CONFIGS=comma,separated,names.
"""

import json
import os
import time

import numpy as np


def _run(engine, mp, token_cap, frame_cap, steps, batch, embedding_scale=1.0,
         use_ref=False, iters=5):
    import jax
    import jax.numpy as jnp

    fkey = (token_cap, steps, float(embedding_scale), use_ref,
            0.3 if use_ref else None, 0.7 if use_ref else None)
    engine._alpha, engine._beta = 0.3, 0.7
    if fkey not in engine._frontend_cache:
        engine._frontend_cache[fkey] = engine._frontend_fn(
            token_cap, steps, embedding_scale, use_ref=use_ref)
    frontend = engine._frontend_cache[fkey]
    if (token_cap, frame_cap) not in engine._synth_cache:
        engine._synth_cache[(token_cap, frame_cap)] = engine._synth_fn(
            token_cap, frame_cap)
    synth = engine._synth_cache[(token_cap, frame_cap)]

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(4, 170, (batch, token_cap)), dtype=jnp.int32)
    lengths = jnp.full((batch,), token_cap, dtype=jnp.int32)
    noise = jnp.asarray(rng.standard_normal((batch, 1, mp.style_dim * 2)).astype(np.float32))
    ref = jnp.asarray(rng.standard_normal((batch, mp.style_dim * 2)).astype(np.float32)) \
        if use_ref else jnp.zeros((batch, mp.style_dim * 2))
    zeros = jnp.zeros((batch, mp.style_dim * 2))
    key = jax.random.PRNGKey(0)

    def full(zoo):
        t_en, d, s, r, s_out, pred_dur = frontend(
            zoo, tokens, lengths, key, noise, ref, zeros, jnp.float32(0.0))
        pred_dur = jnp.minimum(pred_dur, frame_cap // token_cap)
        return synth(zoo, t_en, d, s, r, pred_dur, lengths)

    # block_until_ready does not force execution on the tunneled TPU
    # backend; fold every iteration into one fetched scalar instead
    # (see bench.py for the measurement).
    wav = full(engine.zoo)
    _ = float(wav[0, -1])
    # two timed windows, report the second (see bench.py)
    dt = None
    for _round in range(2):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            wav = full(engine.zoo)
            part = wav[0, -1]
            acc = part if acc is None else acc + part
        _ = float(acc)
        dt = (time.perf_counter() - t0) / iters
    audio_seconds = batch * wav.shape[-1] / 24000.0
    return audio_seconds / dt


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from styletts2_tpu.config import ModelParams, load_config
    from styletts2_tpu.infer import InferenceEngine
    from styletts2_tpu.models.plbert import PLBertConfig
    from styletts2_tpu.models.zoo import build_zoo
    from styletts2_tpu.utils import cast_pytree, enable_compilation_cache
    enable_compilation_cache()

    platform = jax.devices()[0].platform
    bf16 = os.environ.get("BENCH_DTYPE", "bf16") == "bf16" and platform == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    token_cap, frame_cap = 64, 400
    only = os.environ.get("BENCH_CONFIGS")
    only = set(only.split(",")) if only else None

    def make_engine(mp):
        plbert = PLBertConfig()
        zoo = jax.jit(lambda k: build_zoo(k, mp, plbert, include_slm=False))(
            jax.random.PRNGKey(0))
        engine = InferenceEngine(zoo, mp, plbert)
        if bf16:
            engine.zoo = cast_pytree(engine.zoo, jnp.bfloat16)
            engine.compute_dtype = jnp.bfloat16
        return engine

    results = []

    def record(config, value, **extra):
        row = {"config": config, "audio_s_per_s": round(float(value), 1),
               "batch": batch, "dtype": "bf16" if bf16 else "fp32",
               "platform": platform, **extra}
        results.append(row)
        print(json.dumps(row), flush=True)

    lj = ModelParams()  # LJSpeech iSTFTNet defaults
    engine = None
    for steps in (3, 5, 10):
        name = f"ljspeech_istftnet_steps{steps}"
        if only and name not in only:
            continue
        if engine is None:
            engine = make_engine(lj)
        record(name, _run(engine, lj, token_cap, frame_cap, steps, batch),
               diffusion_steps=steps)

    name = "ljspeech_istftnet_cfg2"
    if not only or name in only:
        if engine is None:
            engine = make_engine(lj)
        record(name, _run(engine, lj, token_cap, frame_cap, 5, batch,
                          embedding_scale=2.0),
               diffusion_steps=5, embedding_scale=2.0)
    del engine

    name = "ljspeech_hifigan_steps5"
    if not only or name in only:
        hifi = dataclasses.replace(
            lj, decoder=dataclasses.replace(
                lj.decoder, type="hifigan",
                upsample_rates=(10, 5, 3, 2),
                upsample_kernel_sizes=(20, 10, 6, 4)))
        record(name, _run(make_engine(hifi), hifi, token_cap, frame_cap, 5, batch),
               diffusion_steps=5)

    name = "libritts_zeroshot_steps5"
    if not only or name in only:
        cfg = load_config("configs/libritts.yml")
        mp = cfg.model_params
        record(name, _run(make_engine(mp), mp, token_cap, frame_cap, 5, batch,
                          use_ref=True),
               diffusion_steps=5, multispeaker=True)

    with open(os.environ.get("BENCH_CONFIGS_OUT", "/tmp/bench_configs.json"),
              "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
