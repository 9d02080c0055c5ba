"""Train-step compile-and-run tests on tiny configurations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.train.optimizers import MultiOptimizer
from styletts2_tpu.train.stage1 import Stage1Trainer
from styletts2_tpu.train.stage2 import Stage2Trainer

from tiny_models import tiny_config, tiny_zoo


def make_batch(b=2, frames=96, t_text=12, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "waves": (rng.standard_normal((b, frames * 300)) * 0.1).astype(np.float32),
        "texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
        "input_lengths": np.array([t_text, t_text - 3], np.int32),
        "ref_texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
        "ref_lengths": np.array([t_text, t_text - 2], np.int32),
        "mel_input_length": np.array([frames, frames - 6], np.int32),
        "ref_waves": (rng.standard_normal((b, 32 * 300)) * 0.1).astype(np.float32),
        "ref_frame_lengths": np.array([32, 20], np.int32),
    }


def param_delta(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    return sum(float(jnp.abs(x - y).sum()) for x, y in zip(la, lb))


@pytest.mark.parametrize("tma", [False, True])
def test_stage1_step(tma):
    zoo, cfgs = tiny_zoo()
    cfg = tiny_config()
    opt = MultiOptimizer(zoo, {"bert": 1e-5}, default_lr=1e-4)
    states = opt.init(zoo)
    trainer = Stage1Trainer(cfg, cfgs, opt)
    step = trainer.make_step(tma=tma, mel_len=40, mel_len_st=40)
    batch = make_batch()
    out = step(zoo, states, batch, jax.random.PRNGKey(0))
    for k, v in out.metrics.items():
        assert np.isfinite(float(v)), k
    # generator modules were updated
    assert param_delta(out.params["decoder"], tiny_zoo()[0]["decoder"]) > 0


@pytest.mark.parametrize("phase", ["pre", "diff", "joint_gen", "joint_disc"])
def test_stage2_step(phase):
    zoo, cfgs = tiny_zoo()
    cfg = tiny_config()
    opt = MultiOptimizer(zoo, {"bert": 1e-5}, default_lr=1e-4)
    states = opt.init(zoo)
    trainer = Stage2Trainer(cfg, cfgs, opt)
    flags = {
        "pre": dict(diff=False, joint=False, start_ds=False),
        "diff": dict(diff=True, joint=False, start_ds=True),
        "joint_gen": dict(diff=True, joint=True, start_ds=True, slm_run_disc=False),
        "joint_disc": dict(diff=True, joint=True, start_ds=True, slm_run_disc=True),
    }[phase]
    step = trainer.make_step(mel_len=40, mel_len_st=40, num_diff_steps=3,
                             slm_frame_capacity=32, **flags)
    batch = make_batch()
    out = step(zoo, states, batch, jax.random.PRNGKey(1), jnp.float32(0.2))
    for k, v in out.metrics.items():
        assert np.isfinite(float(v)), k
    assert np.isfinite(float(out.sigma_data))


@pytest.mark.parametrize("rec_frames", [8, 4])
def test_slmadv_discriminator_regularizers(rec_frames):
    """The use_rec discriminator branch adds the length-invariance and
    reconstruction-invariance regularizers on both the real-longer
    (rec_frames=8 -> T_rec > T_pred) and fake-longer (rec_frames=4) paths
    (ref: Modules/slmadv.py:212-249)."""
    from styletts2_tpu.losses.slmadv import slm_adversarial
    from styletts2_tpu.losses.slm import slm_discriminator_loss

    zoo, cfgs = tiny_zoo()
    cfg = tiny_config()
    mp = cfgs["model"]
    adv = cfg.slmadv_params
    rng = np.random.default_rng(3)
    b, t_text, frames = 2, 10, 64
    mel_len = min(adv.min_len // 2, 6)           # -> T_pred = 6*2*300
    t_rec = rec_frames * 2 * 300

    kwargs = dict(
        ref_texts=jnp.asarray(rng.integers(4, 170, (b, t_text)), jnp.int32),
        ref_lengths=jnp.array([t_text, t_text - 2], jnp.int32),
        waves=jnp.asarray(rng.standard_normal((b, frames * 300)) * 0.1, jnp.float32),
        mel_input_length=jnp.array([frames, frames - 6], jnp.int32),
        y_rec_gt=jnp.asarray(rng.standard_normal((b, t_rec)) * 0.1, jnp.float32),
        y_rec_gt_pred=jnp.asarray(rng.standard_normal((b, t_rec)) * 0.1, jnp.float32),
        s_trg=jnp.asarray(rng.standard_normal((b, mp.style_dim * 2)) * 0.1, jnp.float32),
        ref_style=None, num_steps=3, use_ind_style=True,
        run_discriminator=True, frame_capacity=32, mel_len=mel_len,
    )
    run = lambda **kw: slm_adversarial(
        zoo, jax.random.PRNGKey(5), mp, cfgs["plbert"], cfgs["whisper"], adv,
        **{**kwargs, **kw})

    out_plain = run(use_rec=False)
    out_rec = run(use_rec=True)
    out_rec_alt = run(use_rec=True, real_alt=True)
    for out in (out_plain, out_rec, out_rec_alt):
        assert np.isfinite(float(out.d_loss))
        assert float(out.d_loss) > 0
    # the regularized branch differs from the plain LSGAN branch, and the
    # cropped-vs-full real choice changes the loss too
    assert abs(float(out_rec.d_loss) - float(out_plain.d_loss)) > 1e-6
    assert abs(float(out_rec_alt.d_loss) - float(out_rec.d_loss)) > 1e-8


def test_stage1_step_bf16():
    zoo, cfgs = tiny_zoo()
    cfg = tiny_config()
    opt = MultiOptimizer(zoo, {"bert": 1e-5}, default_lr=1e-4)
    states = opt.init(zoo)
    trainer = Stage1Trainer(cfg, cfgs, opt, mixed_precision="bf16")
    step = trainer.make_step(tma=True, mel_len=40, mel_len_st=40)
    out = step(zoo, states, make_batch(), jax.random.PRNGKey(0))
    for k, v in out.metrics.items():
        assert np.isfinite(float(v)), k
    # master params stay fp32
    leaf = jax.tree_util.tree_leaves(out.params["decoder"])[0]
    assert leaf.dtype == jnp.float32
