"""Training-step benchmark: full-size stage-2 step time on the default device.

Round-1 methodology (PARITY.md "Verified benchmarks"): LJSpeech config,
diffusion + joint + GAN discriminator phases, 192-mel-frame clips
(mel_len = 96 en-frames), SLM generator pass included, SLM discriminator
step excluded.

Knobs (env):
  BENCH_TRAIN_BATCH    global batch (default 16)
  BENCH_TRAIN_MELLEN   en-frame clip length (default 96 = 192 mel frames)
  BENCH_TRAIN_DTYPE    bf16|fp32 (default bf16)
  BENCH_TRAIN_PROFILE  directory -> wrap timed iters in jax.profiler.trace

Prints one JSON line with ms/step and training audio-throughput
(audio_s consumed per second per chip).
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
    from styletts2_tpu.train.stage2 import Stage2Trainer

    b = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
    mel_len = int(os.environ.get("BENCH_TRAIN_MELLEN", "96"))
    dtype = os.environ.get("BENCH_TRAIN_DTYPE", "bf16")
    profile_dir = os.environ.get("BENCH_TRAIN_PROFILE")

    cfg = load_config("configs/ljspeech.yml")
    configs = zoo_configs(cfg.model_params)
    zoo = jax.jit(lambda k: build_zoo(k, cfg.model_params))(jax.random.PRNGKey(0))
    opt = MultiOptimizer(zoo, make_lr_map(cfg), default_lr=cfg.optimizer_params.lr)
    states = opt.init(zoo)
    platform = jax.devices()[0].platform
    mixed = "bf16" if (dtype == "bf16" and platform == "tpu") else "no"
    trainer = Stage2Trainer(cfg, configs, opt, mixed_precision=mixed)

    step = trainer.make_step(diff=True, joint=True, start_ds=True,
                             mel_len=mel_len, mel_len_st=mel_len,
                             num_diff_steps=4, slm_run_disc=False,
                             slm_frame_capacity=400)

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
    sigma = jnp.float32(0.2)

    # NOTE on methodology: through the tunneled TPU backend
    # ``jax.block_until_ready`` returns without waiting for device execution
    # (measured: a 1.1-TFLOP jit "completes" in 0.3 ms vs a 5.6 ms roofline).
    # Only a device->host transfer forces the work, so every timing below
    # chains the state across iterations and fetches a scalar at the end;
    # the one tunnel round-trip (~25 ms) is amortized over the loop.
    t0 = time.perf_counter()
    out = step(zoo, states, batch, key, sigma)
    _ = float(out.metrics["mel_loss"])
    compile_s = time.perf_counter() - t0

    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "5"))
    ctx = jax.profiler.trace(profile_dir) if profile_dir else None
    if ctx:
        ctx.__enter__()
    # Chain the state through the loop: every iteration depends on the
    # previous one (true training semantics), donated buffers are never
    # reused, and a lazy dispatch path cannot elide unobserved steps.
    # Two timed windows, report the second — the first window after a fresh
    # compile pays a one-off device-memory reorganization (measured up to
    # ~25x on isolated programs).
    o = out
    dt = None
    for r in range(2):
        t0 = time.perf_counter()
        for i in range(iters):
            o = step(o.params, o.opt_states, batch,
                     jax.random.fold_in(key, r * iters + i), sigma)
        _ = float(o.metrics["mel_loss"])
        dt = (time.perf_counter() - t0) / iters
    if ctx:
        ctx.__exit__(None, None, None)

    audio_s = b * frames * 300 / 24000.0
    print(json.dumps({
        "metric": "stage2_step_ms",
        "value": round(dt * 1000.0, 2),
        "unit": "ms",
        "train_audio_s_per_s": round(audio_s / dt, 2),
        "batch": b, "mel_len": mel_len, "frames": frames,
        "dtype": mixed if mixed != "no" else "fp32",
        "platform": platform,
        "compile_s": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
