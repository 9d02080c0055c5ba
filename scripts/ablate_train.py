"""Component-level timing of the stage-2 training step (TPU ablation profile).

The jax.profiler cannot attach through the axon tunnel (the plugin rejects
the profiler RPCs), so this times each major subgraph of the step as its own
jitted value_and_grad at the exact shapes bench_train.py uses.  The pieces
compile in 1-3 min each (vs 10+ for the full step) and their sum brackets
the full-step time, giving an actionable breakdown.

Usage: python scripts/ablate_train.py [component ...]
Components: decoder gan slm aligner styles diffusion textpred all
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scalar(out):
    """First element of the first leaf: a device scalar that depends on the
    call, cheap to fetch."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return leaf.ravel()[0].astype("float32")


def _time(fn, *args, iters=10):
    """block_until_ready does not force execution through the tunneled TPU
    backend; accumulate a scalar from every iteration and fetch it once (all
    iterations must then execute; one tunnel RTT amortized over the loop).

    Two timed windows, report the second: the first window after a new
    program's working set lands pays a one-off allocator reorganization that
    can inflate it ~25x (measured: 1072 ms then 39 ms for identical loops)."""
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

    from styletts2_tpu.audio.mel import DATASET_MEL, log_mel_spectrogram
    from styletts2_tpu.config import load_config
    from styletts2_tpu.models.zoo import build_zoo, zoo_configs

    which = set(sys.argv[1:]) or {"all"}
    b = int(os.environ.get("ABLATE_BATCH", "16"))
    mel_len = int(os.environ.get("ABLATE_MELLEN", "96"))
    t_text = 128
    frames = 2 * mel_len + 16
    wav_len = mel_len * 2 * 300

    cfg = load_config("configs/ljspeech.yml")
    mp = cfg.model_params
    configs = zoo_configs(mp)
    zoo = jax.jit(lambda k: build_zoo(k, mp))(jax.random.PRNGKey(0))
    zoo = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, zoo)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    class _Results(dict):
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(json.dumps({k: round(v, 2)}), flush=True)

    results = _Results()

    def bf(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.1, dtype=jnp.bfloat16)

    if which & {"decoder", "all"}:
        from styletts2_tpu.models.decoder import istftnet

        asr = bf((b, 512, mel_len))
        f0 = bf((b, 2 * mel_len))
        n = bf((b, 2 * mel_len))
        s = bf((b, mp.style_dim))

        def dec_loss(dp, asr, f0, n, s):
            y = istftnet.decoder_apply(dp, mp.decoder, asr, f0, n, s,
                                       key=key, train=True)
            return jnp.mean(jnp.abs(y).astype(jnp.float32))

        g = jax.jit(jax.value_and_grad(dec_loss))
        results["decoder_fwd_bwd_ms"] = _time(g, zoo["decoder"], asr, f0, n, s)
        fwd = jax.jit(dec_loss)
        results["decoder_fwd_ms"] = _time(fwd, zoo["decoder"], asr, f0, n, s)

    if which & {"gan", "all"}:
        from styletts2_tpu.losses.gan import (discriminator_loss_full,
                                              generator_loss_full)
        from styletts2_tpu.models.discriminators import mpd_apply, msd_apply

        y = bf((b, 1, wav_len))
        y_rec = bf((b, 1, wav_len))

        def d_loss(disc, y, y_rec):
            return discriminator_loss_full(
                mpd_apply(disc["mpd"], y, y_rec),
                msd_apply(disc["msd"], y, y_rec))

        disc = {"mpd": zoo["mpd"], "msd": zoo["msd"]}
        g = jax.jit(jax.value_and_grad(d_loss))
        results["gan_disc_fwd_bwd_ms"] = _time(g, disc, y, y_rec)

        def g_loss(y_rec, disc, y):
            return generator_loss_full(
                mpd_apply(disc["mpd"], y, y_rec, batched=False),
                msd_apply(disc["msd"], y, y_rec, batched=False))

        g2 = jax.jit(jax.value_and_grad(g_loss))
        results["gan_gen_fwd_bwd_ms"] = _time(g2, y_rec, disc, y)

    if which & {"gansplit"}:
        from styletts2_tpu.losses.gan import discriminator_loss
        from styletts2_tpu.models.discriminators import mpd_apply, msd_apply

        y = bf((b, 1, wav_len))
        y_rec = bf((b, 1, wav_len))

        def mpd_d(p, y, y_rec):
            rs, gs, _, _ = mpd_apply(p, y, y_rec)
            return discriminator_loss(rs, gs)

        def msd_d(p, y, y_rec):
            rs, gs, _, _ = msd_apply(p, y, y_rec)
            return discriminator_loss(rs, gs)

        g1 = jax.jit(jax.value_and_grad(mpd_d))
        results["mpd_disc_fwd_bwd_ms"] = _time(g1, zoo["mpd"], y, y_rec)
        g2 = jax.jit(jax.value_and_grad(msd_d))
        results["msd_disc_fwd_bwd_ms"] = _time(g2, zoo["msd"], y, y_rec)

    if which & {"slm", "all"}:
        from styletts2_tpu.losses.slm import slm_feature_loss

        wav = bf((b, wav_len)).astype(jnp.float32)
        y_rec = bf((b, wav_len)).astype(jnp.float32)
        g = jax.jit(jax.value_and_grad(
            lambda yr: slm_feature_loss(zoo["slm_encoder"], wav, yr,
                                        configs["whisper"], mp.slm.hop_length)))
        results["slm_feature_fwd_bwd_ms"] = _time(g, y_rec)

    if which & {"aligner", "all"}:
        from styletts2_tpu.train.stage1 import compute_alignment

        waves = jnp.asarray(rng.standard_normal((b, frames * 300)) * 0.1,
                            dtype=jnp.float32)
        mels = log_mel_spectrogram(waves, DATASET_MEL)
        mels = mels[..., : (mels.shape[-1] // 2) * 2]
        mel_lengths = jnp.full((b,), frames, jnp.int32)
        texts = jnp.asarray(rng.integers(4, 170, (b, t_text)), jnp.int32)
        text_lengths = jnp.full((b,), t_text, jnp.int32)

        fwd = jax.jit(lambda z, m: compute_alignment(
            z, m, mel_lengths, texts, text_lengths, configs["asr"],
            train=False, rng=None)[3])
        results["aligner_fwd_ms"] = _time(fwd, zoo, mels)

    if which & {"styles", "all"}:
        from styletts2_tpu.models.style_encoder import style_encoder_apply

        mels = bf((b, 1, 80, frames))
        lens = jnp.full((b,), frames, jnp.int32)

        def sty(p, m):
            a = style_encoder_apply(p["style_encoder"], m, lens)
            c = style_encoder_apply(p["predictor_encoder"], m, lens)
            return jnp.mean(jnp.abs(a).astype(jnp.float32)) + \
                jnp.mean(jnp.abs(c).astype(jnp.float32))

        g = jax.jit(jax.value_and_grad(sty))
        ps = {"style_encoder": zoo["style_encoder"],
              "predictor_encoder": zoo["predictor_encoder"]}
        results["styles_fwd_bwd_ms"] = _time(g, ps, mels)

    if which & {"diffusion", "all"}:
        from styletts2_tpu.models.diffusion import sampler as S
        from styletts2_tpu.models.diffusion.denoiser import denoiser_apply

        bert_dur = bf((b, t_text, 768))
        s_trg = bf((b, 1, mp.style_dim * 2))

        def diff_loss(dp, s_trg):
            def net(x, c_noise):
                return denoiser_apply(dp["transformer"], x, c_noise, bert_dur,
                                      features=None,
                                      num_heads=mp.diffusion.transformer.num_heads,
                                      style_conditioned=False)
            return S.k_diffusion_loss(key, net, s_trg, jnp.float32(0.2),
                                      mp.diffusion.dist.mean, mp.diffusion.dist.std)

        g = jax.jit(jax.value_and_grad(diff_loss))
        results["diffusion_loss_fwd_bwd_ms"] = _time(g, zoo["diffusion"], s_trg)

        def sample(dp):
            def net(x, c_noise):
                return denoiser_apply(dp["transformer"], x, c_noise, bert_dur,
                                      features=None,
                                      num_heads=mp.diffusion.transformer.num_heads,
                                      style_conditioned=False)
            fn = S.k_denoise_fn(net, jnp.float32(0.2))
            noise = jax.random.normal(key, (b, 1, mp.style_dim * 2))
            return S.adpm2_sample(key, noise, fn, S.karras_schedule(4), 4)

        results["diffusion_sample4_fwd_ms"] = _time(jax.jit(sample), zoo["diffusion"])

    if which & {"textpred", "all"}:
        from styletts2_tpu.models.plbert import plbert_apply
        from styletts2_tpu.models.predictor import (prosody_duration_apply,
                                                    prosody_f0n_apply)
        from styletts2_tpu.models.text_encoder import text_encoder_apply
        from styletts2_tpu.models import common as cm
        from styletts2_tpu.nn.linear import linear

        texts = jnp.asarray(rng.integers(4, 170, (b, t_text)), jnp.int32)
        text_lengths = jnp.full((b,), t_text, jnp.int32)
        attn = bf((b, t_text, 2 * mel_len)).astype(jnp.float32)
        s = bf((b, mp.style_dim))
        p_en = bf((b, 512 + mp.style_dim, mel_len))

        def tp(params):
            t_en = text_encoder_apply(params["text_encoder"], texts, text_lengths)
            pad = cm.length_to_mask(text_lengths, t_text)
            bert_dur = plbert_apply(params["bert"], texts,
                                    (~pad).astype(jnp.int32), configs["plbert"])
            d_en = jnp.swapaxes(
                linear(bert_dur, params["bert_encoder"]["weight"],
                       params["bert_encoder"]["bias"]), 1, 2)
            dur, p_full = prosody_duration_apply(
                params["predictor"], d_en, s, text_lengths, attn, mp.n_layer,
                train=True, rng=key)
            f0, n = prosody_f0n_apply(params["predictor"], p_en, s,
                                      train=True, rng=key)
            return (jnp.mean(jnp.abs(dur).astype(jnp.float32))
                    + jnp.mean(jnp.abs(f0).astype(jnp.float32))
                    + jnp.mean(jnp.abs(t_en).astype(jnp.float32)))

        g = jax.jit(jax.value_and_grad(tp))
        ps = {k: zoo[k] for k in ("text_encoder", "bert", "bert_encoder",
                                  "predictor")}
        results["textpred_fwd_bwd_ms"] = _time(g, ps)

    if which & {"slmadv", "all"}:
        from styletts2_tpu.losses.slmadv import slm_adversarial

        texts = jnp.asarray(rng.integers(4, 170, (b, t_text)), jnp.int32)
        text_lengths = jnp.full((b,), t_text, jnp.int32)
        waves = jnp.asarray(rng.standard_normal((b, frames * 300)) * 0.1,
                            dtype=jnp.float32)
        mel_input_length = jnp.full((b,), frames, jnp.int32)
        clip = bf((b, wav_len)).astype(jnp.float32)
        s_trg = bf((b, mp.style_dim * 2))

        slm_keys = ("bert_encoder", "bert", "predictor", "diffusion")

        def slm_gen(sp):
            z = {**zoo, **sp}
            out = slm_adversarial(
                z, key, mp, configs["plbert"], configs["whisper"],
                cfg.slmadv_params, texts, text_lengths, waves,
                mel_input_length, clip, clip, s_trg, None,
                num_steps=4, use_ind_style=False, run_discriminator=False,
                frame_capacity=400, mel_len=mel_len)
            return out.gen_loss

        g = jax.jit(jax.value_and_grad(slm_gen))
        results["slmadv_gen_fwd_bwd_ms"] = _time(
            g, {k: zoo[k] for k in slm_keys})

    print(json.dumps({"batch": b, "mel_len": mel_len, **{
        k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
