"""Host training-loop smoke tests (bucketing, phases, checkpoints)."""

import os

import numpy as np
import pytest

import jax

from styletts2_tpu.testing import tiny_config, tiny_zoo
from styletts2_tpu.train.loop import run_stage1, run_stage2
from styletts2_tpu.parallel.mesh import make_mesh
import dataclasses


def fake_loader(n_batches=2, b=2, frames=96, t_text=12):
    rng = np.random.default_rng(0)

    def loader(epoch=0):
        for _ in range(n_batches):
            yield {
                "waves": (rng.standard_normal((b, frames * 300)) * 0.1).astype(np.float32),
                "texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
                "input_lengths": np.array([t_text, t_text - 2], np.int32),
                "ref_texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
                "ref_lengths": np.array([t_text, t_text - 1], np.int32),
                "mel_input_length": np.array([frames, frames - 6], np.int32),
                "ref_waves": (rng.standard_normal((b, 32 * 300)) * 0.1).astype(np.float32),
                "ref_frame_lengths": np.full((b,), 32, np.int32),
            }

    return loader


def test_run_stage1_two_steps(tmp_path):
    zoo, cfgs = tiny_zoo()
    cfg = dataclasses.replace(tiny_config(), epochs_1st=1, log_dir=str(tmp_path),
                              save_freq=1, max_len=400, log_interval=1)
    logs = []
    # no max_steps: the 2-batch loader completes the single epoch, so the
    # per-epoch and terminal checkpoints must both be written
    state = run_stage1(cfg, cfgs, zoo, fake_loader(),
                       mesh=make_mesh(n_data=2),
                       log_cb=lambda s, m: logs.append(m))
    assert state.iters == 2
    assert state.epoch == 1
    assert logs, "log_cb was never invoked"
    for m in logs:
        for k, v in m.items():
            assert np.isfinite(v), f"non-finite metric {k}={v}"
    assert (tmp_path / "epoch_1st_00000.npz").exists()
    assert (tmp_path / (cfg.first_stage_path + ".npz")).exists()


def test_run_stage1_resume(tmp_path):
    """Kill after one epoch, resume, verify epoch/iter/opt-state continuity
    (ref: models.py:1231-1238 load_only_params=False semantics)."""
    zoo, cfgs = tiny_zoo()
    cfg = dataclasses.replace(tiny_config(), epochs_1st=1, log_dir=str(tmp_path),
                              save_freq=1, max_len=400)
    mesh = make_mesh(n_data=2)
    run_stage1(cfg, cfgs, zoo, fake_loader(), mesh=mesh)
    ckpt = tmp_path / "epoch_1st_00000.npz"
    assert ckpt.exists()

    # fresh zoo + resume: must pick up at epoch 1 / iter 2 and run one more epoch
    zoo2, _ = tiny_zoo()
    cfg2 = dataclasses.replace(cfg, epochs_1st=2)
    state = run_stage1(cfg2, cfgs, zoo2, fake_loader(), mesh=mesh,
                       resume_from=str(ckpt))
    assert state.epoch == 2
    assert state.iters == 4


def test_run_stage2_two_steps(tmp_path):
    zoo, cfgs = tiny_zoo()
    cfg = dataclasses.replace(tiny_config(), epochs_2nd=1, log_dir=str(tmp_path),
                              save_freq=1, max_len=400)
    # pre-diffusion phase (epoch 0 < diff_epoch default 20): cheapest variant
    state = run_stage2(cfg, cfgs, zoo, fake_loader(), max_steps=2,
                       mesh=make_mesh(n_data=2))
    assert state.iters == 2
    assert np.isfinite(state.sigma_data)
