"""Coverage for auxiliary components: ASR multi-task heads, diffusion
variants, Discriminator2d, post-processing, utils."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

KEY = jax.random.PRNGKey(0)


def test_asr_multitask_heads():
    from styletts2_tpu.models.asr import ASRConfig, asr_apply, init_asr

    cfg = ASRConfig(hidden_dim=32, n_layers=3, n_token=50, token_embedding_dim=16,
                    location_kernel_size=7,
                    intermediate_ctc_layers=(2,), self_conditioned_layers=(3,),
                    enable_frame_classifier=True, enable_speaker=True,
                    num_speakers=4, enable_pron_error=True,
                    stochastic_depth_rate=0.1)
    params = init_asr(KEY, cfg)
    b, t_mel, t_text = 2, 24, 6
    mels = jax.random.normal(KEY, (b, 80, t_mel))
    mask = jnp.zeros((b, t_mel // 2), bool)
    text = jax.random.randint(KEY, (b, t_text), 0, 50)
    out = asr_apply(params, mels, mask, text, cfg, train=True,
                    rng=jax.random.PRNGKey(1))
    assert out["intermediate_ctc_logits"]["2"].shape == (b, t_mel // 2, 50)
    assert out["self_conditioned_ctc_logits"]["3"].shape == (b, t_mel // 2, 50)
    assert out["frame_phoneme_logits"].shape == (b, t_mel // 2, 50)
    assert out["speaker_logits"].shape == (b, 4)
    assert out["pron_error_logits"].shape == (b, t_text, 2)
    assert out["duration_predictions"].shape == (b, t_text, 1)
    assert (np.asarray(out["duration_predictions"]) >= 0).all()


def test_diffusion_variants():
    from styletts2_tpu.models.diffusion import variants as V
    from styletts2_tpu.models.diffusion.sampler import karras_schedule

    net = lambda x, t: 0.5 * x
    x = jax.random.normal(KEY, (2, 1, 8))
    assert np.isfinite(float(V.v_diffusion_loss(KEY, net, x)))
    assert np.isfinite(float(V.vk_diffusion_loss(KEY, net, x)))

    sig = jnp.linspace(1.0, 0.0, 5)
    out = V.v_sample(x, net, sig, 5)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()

    fn = V.vk_denoise_fn(net)
    sigmas = karras_schedule(4)
    mask = jnp.zeros_like(x).at[..., :4].set(1.0)
    inp = V.adpm2_inpaint(KEY, x, mask, fn, sigmas, 4, 2)
    assert inp.shape == x.shape
    np.testing.assert_allclose(np.asarray(inp[..., :4]), np.asarray(x[..., :4]))

    comp = V.span_by_span_compose(KEY, x, fn, sigmas, 4, 1, num_spans=2)
    assert comp.shape[-1] == 2 * (x.shape[-1] // 2)


def test_discriminator2d():
    from styletts2_tpu.models.style_encoder import (
        discriminator2d_apply, init_discriminator2d)

    params = init_discriminator2d(KEY, dim_in=8, max_conv_dim=16)
    x = jax.random.normal(KEY, (2, 1, 80, 96))
    out = discriminator2d_apply(params, x)
    assert out.shape == (2, 1)


def test_postprocess():
    from styletts2_tpu.audio.postprocess import (
        crossfade_concat, spectral_gate_denoise, trim_tail)

    rng = np.random.default_rng(0)
    a, b = rng.standard_normal(2400).astype(np.float32), rng.standard_normal(2400).astype(np.float32)
    out = crossfade_concat([a, b], fade_ms=10)
    assert len(out) < len(a) + len(b)
    assert len(trim_tail(a, 50)) == len(a) - 50
    den = spectral_gate_denoise(a)
    assert den.shape == a.shape and np.isfinite(den).all()


def test_utils():
    from styletts2_tpu.utils import MetricsWriter, rtf, select_mixed_precision, cast_pytree
    import tempfile, json, os

    assert rtf(1.0, 24000) == 1.0
    assert select_mixed_precision("bf16") == "bf16"
    assert select_mixed_precision("auto") in ("no", "bf16")
    with tempfile.TemporaryDirectory() as d:
        w = MetricsWriter(d)
        w.add_scalars(1, {"loss": 0.5})
        w.close()
        rec = json.loads(open(os.path.join(d, "metrics.jsonl")).read().splitlines()[0])
        assert rec["train/loss"] == 0.5
    tree = {"a": jnp.ones(3), "b": jnp.array([1, 2])}
    out = cast_pytree(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16 and out["b"].dtype == tree["b"].dtype


def test_generate_training_samples(tmp_path):
    import numpy as np
    from styletts2_tpu.testing import tiny_zoo
    from styletts2_tpu.train.samples import generate_samples

    zoo, cfgs = tiny_zoo(include_slm=False)
    rng = np.random.default_rng(0)
    b, frames, t_text = 2, 96, 10
    batch = {
        "waves": (rng.standard_normal((b, frames * 300)) * 0.1).astype(np.float32),
        "texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
        "input_lengths": np.array([t_text, t_text - 2], np.int32),
        "mel_input_length": np.array([frames, frames - 6], np.int32),
    }
    out = str(tmp_path / "samples")
    generate_samples(zoo, cfgs, batch, out, frame_capacity=100)
    import os
    files = sorted(os.listdir(out))
    assert "0_gt.wav" in files and "0_rec.wav" in files and "0_pred.wav" in files
    # attention heatmap (png via matplotlib, npy fallback)
    assert "0_attn.png" in files or "0_attn.npy" in files


def test_asr_gradient_checkpointing():
    import jax.numpy as jnp
    from styletts2_tpu.models.asr import ASRConfig, asr_apply, init_asr

    cfg = ASRConfig(hidden_dim=32, n_layers=2, n_token=50, token_embedding_dim=16,
                    location_kernel_size=7, gradient_checkpointing=True)
    params = init_asr(KEY, cfg)
    mels = jax.random.normal(KEY, (2, 80, 24))
    mask = jnp.zeros((2, 12), bool)
    text = jax.random.randint(KEY, (2, 6), 0, 50)

    def loss(p):
        out = asr_apply(p, mels, mask, text, cfg, train=True, rng=jax.random.PRNGKey(1))
        return jnp.mean(out["ctc_logits"] ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
