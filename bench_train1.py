"""Stage-1 training-step benchmark: full-size step time on the default device.

Stage 1 is mel reconstruction + TMA joint aligner training
(ref: train_first.py:312-455); the benchmarked variant is the post-TMA
phase (epoch >= TMA_epoch): aligner + pitch-extractor joint updates, GAN
discriminator step, mel/mono/s2s/gen/slm generator losses — the heaviest
stage-1 step.  Methodology identical to bench_train.py (chained-state
iterations, scalar fetch as the only sync, second timed window).

Knobs (env): BENCH_TRAIN_BATCH (16), BENCH_TRAIN_MELLEN (96 en-frames),
BENCH_TRAIN_DTYPE (bf16), BENCH_REAL_INIT (numpy-materialized zoo default).

Prints one JSON line with ms/step and training audio-throughput.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from styletts2_tpu.config import load_config
    from styletts2_tpu.models.zoo import build_zoo, zoo_configs
    from styletts2_tpu.train.loop import make_lr_map
    from styletts2_tpu.train.optimizers import MultiOptimizer
    from styletts2_tpu.train.stage1 import Stage1Trainer

    b = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
    mel_len = int(os.environ.get("BENCH_TRAIN_MELLEN", "96"))
    dtype = os.environ.get("BENCH_TRAIN_DTYPE", "bf16")

    cfg = load_config("configs/ljspeech.yml")
    configs = zoo_configs(cfg.model_params)
    if os.environ.get("BENCH_REAL_INIT") == "1":
        zoo = jax.jit(lambda k: build_zoo(k, cfg.model_params))(jax.random.PRNGKey(0))
    else:
        from styletts2_tpu.utils import materialize_params

        zoo = materialize_params(jax.eval_shape(
            lambda k: build_zoo(k, cfg.model_params), jax.random.PRNGKey(0)))
    opt = MultiOptimizer(zoo, make_lr_map(cfg), default_lr=cfg.optimizer_params.lr)
    states = opt.init(zoo)
    platform = jax.devices()[0].platform
    mixed = "bf16" if (dtype == "bf16" and platform == "tpu") else "no"
    trainer = Stage1Trainer(cfg, configs, opt, mixed_precision=mixed)

    step = trainer.make_step(tma=True, mel_len=mel_len, mel_len_st=mel_len)

    frames = 2 * mel_len + 16
    t_text = 128
    rng = np.random.default_rng(0)
    batch = {
        "waves": (rng.standard_normal((b, frames * 300)) * 0.1).astype(np.float32),
        "texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
        "input_lengths": np.full((b,), t_text, np.int32),
        "ref_texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
        "ref_lengths": np.full((b,), t_text, np.int32),
        "mel_input_length": np.full((b,), frames, np.int32),
        "ref_waves": (rng.standard_normal((b, 192 * 300)) * 0.1).astype(np.float32),
        "ref_frame_lengths": np.full((b,), 192, np.int32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(0)

    # chained-state + scalar-fetch sync; second timed window (see
    # bench_train.py NOTE for the tunneled-backend rationale)
    t0 = time.perf_counter()
    out = step(zoo, states, batch, key)
    _ = float(out.metrics["mel_loss"])
    compile_s = time.perf_counter() - t0

    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "5"))
    o = out
    dt = None
    for r in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            o = step(o.params, o.opt_states, batch,
                     jax.random.fold_in(key, r * iters + i))
        _ = float(o.metrics["mel_loss"])
        dt = (time.perf_counter() - t0) / iters

    audio_s = b * frames * 300 / 24000.0
    print(json.dumps({
        "metric": "stage1_step_ms",
        "value": round(dt * 1000.0, 2),
        "unit": "ms",
        "train_audio_s_per_s": round(audio_s / dt, 2),
        "batch": b, "mel_len": mel_len, "frames": frames,
        "dtype": mixed if mixed != "no" else "fp32",
        "platform": platform,
        "compile_s": round(compile_s, 1),
        "tma": True,
    }))


if __name__ == "__main__":
    main()
