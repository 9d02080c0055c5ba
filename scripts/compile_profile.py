"""Per-component XLA compile-time profile of the stage-2 step (round-5
VERDICT item 4: step compile_s 452 in round 4; target < 150).

Times ``jax.jit(...).lower(...).compile()`` for each stage-2 subgraph at the
bench shapes, then the full step.  Components mirror ablate_train.py's but
measure COMPILATION, not runtime.

Usage: python scripts/compile_profile.py [component ...]
  components: decoder disc slmadv diffusion bert whisper full
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.config import load_config
    from styletts2_tpu.models.zoo import build_zoo, zoo_configs
    from styletts2_tpu.utils import materialize_params

    which = set(sys.argv[1:]) or {"decoder", "disc", "slmadv", "diffusion",
                                  "bert", "whisper", "full"}
    cfg = load_config("configs/ljspeech.yml")
    mp = cfg.model_params
    configs = zoo_configs(mp)
    zoo = materialize_params(jax.eval_shape(
        lambda k: build_zoo(k, mp), jax.random.PRNGKey(0)))

    b, mel_len = 16, 96
    frames = 2 * mel_len + 16
    t_text = 128
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    results = {}

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        jax.jit(fn).lower(*args).compile()
        results[name] = round(time.perf_counter() - t0, 1)
        print(f"{name:10s} compile {results[name]:7.1f} s", flush=True)

    def bf(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.3, jnp.bfloat16)

    if "decoder" in which:
        from styletts2_tpu.models.decoder import istftnet

        asr = bf((b, 512, mel_len))
        f0 = jnp.abs(bf((b, 2 * mel_len)).astype(jnp.float32)) * 100
        n = bf((b, 2 * mel_len)).astype(jnp.float32)
        s = bf((b, 128))

        def dec_loss(dp, asr, f0, n, s):
            y = istftnet.decoder_apply(dp, mp.decoder, asr, f0, n, s, key=key,
                                       train=True)
            return (y.astype(jnp.float32) ** 2).mean()

        timed("decoder", jax.value_and_grad(dec_loss), zoo["decoder"], asr, f0, n, s)

    if "disc" in which:
        from styletts2_tpu.models.discriminators import mpd_apply, msd_apply
        from styletts2_tpu.losses.gan import discriminator_loss_full

        y = bf((b, 1, frames * 300)).astype(jnp.float32)
        y_rec = bf((b, 1, frames * 300)).astype(jnp.float32)

        def d_loss(disc, y, y_rec):
            return discriminator_loss_full(
                mpd_apply(disc["mpd"], y, y_rec),
                msd_apply(disc["msd"], y, y_rec))

        timed("disc", jax.value_and_grad(d_loss),
              {"mpd": zoo["mpd"], "msd": zoo["msd"]}, y, y_rec)

    if "bert" in which:
        from styletts2_tpu.models.plbert import plbert_apply

        toks = jnp.asarray(rng.integers(4, 170, (b, t_text)), jnp.int32)
        mask = jnp.ones((b, t_text), jnp.int32)

        def bert_loss(bp):
            h = plbert_apply(bp, toks, mask, configs["plbert"])
            return (h.astype(jnp.float32) ** 2).mean()

        timed("bert", jax.value_and_grad(bert_loss), zoo["bert"])

    if "whisper" in which:
        from styletts2_tpu.models.whisper import whisper_encoder_apply

        mel = bf((b, 80, 600)).astype(jnp.float32)   # ~6 s clip, the stage-2 regime

        def wl(wp):
            hs = whisper_encoder_apply(wp, mel, configs["whisper"])
            return sum((h.astype(jnp.float32) ** 2).mean() for h in hs)

        timed("whisper", jax.value_and_grad(wl), zoo["slm_encoder"])

    if "diffusion" in which:
        from styletts2_tpu.models.diffusion import sampler as S
        from styletts2_tpu.models.diffusion.denoiser import denoiser_cfg_apply

        emb = bf((b, t_text, 768)).astype(jnp.float32)
        noise = bf((b, 1, 256)).astype(jnp.float32)

        def sample(dp):
            def net(x, c_noise):
                return denoiser_cfg_apply(dp, x, c_noise, emb,
                                          embedding_scale=1.0,
                                          num_heads=mp.diffusion.transformer.num_heads)
            fn = S.k_denoise_fn(net, 0.2)
            sig = S.karras_schedule(4)
            out = S.adpm2_sample(key, noise, fn, sig, 4, clamp=False)
            return (out.astype(jnp.float32) ** 2).mean()

        timed("diffusion", jax.value_and_grad(sample), zoo["diffusion"]["transformer"])

    if "slmadv" in which:
        from styletts2_tpu.losses.slmadv import slm_adversarial

        texts = jnp.asarray(rng.integers(4, 170, (b, t_text)), jnp.int32)
        tl = jnp.full((b,), t_text, jnp.int32)
        waves = bf((b, frames * 300)).astype(jnp.float32)
        mil = jnp.full((b,), frames, jnp.int32)
        clip = bf((b, mel_len * 600)).astype(jnp.float32)
        s_trg = bf((b, 256)).astype(jnp.float32)
        slm_keys = ("bert_encoder", "bert", "predictor", "diffusion")

        def slm_gen(sp):
            z = {**zoo, **sp}
            out = slm_adversarial(
                z, key, mp, configs["plbert"], configs["whisper"],
                cfg.slmadv_params, texts, tl, waves, mil, clip, clip, s_trg,
                None, num_steps=4, use_ind_style=False,
                run_discriminator=False, frame_capacity=400, mel_len=mel_len)
            return out.gen_loss

        timed("slmadv", jax.value_and_grad(slm_gen),
              {k: zoo[k] for k in slm_keys})

    if "full" in which:
        from styletts2_tpu.train.loop import make_lr_map
        from styletts2_tpu.train.optimizers import MultiOptimizer
        from styletts2_tpu.train.stage2 import Stage2Trainer

        opt = MultiOptimizer(zoo, make_lr_map(cfg), default_lr=cfg.optimizer_params.lr)
        states = opt.init(zoo)
        platform = jax.devices()[0].platform
        mixed = "bf16" if platform == "tpu" else "no"
        trainer = Stage2Trainer(cfg, configs, opt, mixed_precision=mixed)
        step = trainer.make_step(diff=True, joint=True, start_ds=True,
                                 mel_len=mel_len, mel_len_st=mel_len,
                                 num_diff_steps=4, slm_run_disc=False,
                                 slm_frame_capacity=400)
        batch = {
            "waves": bf((b, frames * 300)).astype(jnp.float32),
            "texts": jnp.asarray(rng.integers(4, 170, (b, t_text)), jnp.int32),
            "input_lengths": jnp.full((b,), t_text, jnp.int32),
            "ref_texts": jnp.asarray(rng.integers(4, 170, (b, t_text)), jnp.int32),
            "ref_lengths": jnp.full((b,), t_text, jnp.int32),
            "mel_input_length": jnp.full((b,), frames, jnp.int32),
            "ref_waves": bf((b, 192 * 300)).astype(jnp.float32),
            "ref_frame_lengths": jnp.full((b,), 192, jnp.int32),
        }
        t0 = time.perf_counter()
        out = step(zoo, states, batch, key, jnp.float32(0.2))
        _ = float(out.metrics["mel_loss"])
        results["full"] = round(time.perf_counter() - t0, 1)
        print(f"{'full':10s} compile {results['full']:7.1f} s", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
