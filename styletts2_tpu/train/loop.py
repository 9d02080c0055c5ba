"""Training drivers — the ``train_first.py`` / ``train_second.py`` /
``train_finetune.py`` equivalents (ref: SURVEY.md §2.5).

The host loop owns epochs, data, bucketing decisions, checkpointing, and
logging; each step runs as one jitted SPMD program on the mesh.  Static
phase flags (TMA / diffusion / joint / SLM alternation) select among a small
set of compiled step variants.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..parallel.distributed import host_global_min, is_main_process
from ..parallel.mesh import make_mesh, replicate_params, shard_batch
from .checkpoint import load_checkpoint, save_checkpoint
from .optimizers import MultiOptimizer
from .stage1 import Stage1Trainer
from .stage2 import Stage2Trainer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainState:
    params: Dict
    opt_states: Dict
    epoch: int = 0
    iters: int = 0
    sigma_data: float = 0.2


def _clip_lengths(mel_lengths: np.ndarray, max_len: int) -> int:
    """Static clip length for this batch: global min over the batch — the
    host-local min pushed through cross-host consensus, like the reference's
    gathered min (ref: train_first.py:348-350).  All hosts must agree because
    this value selects the compiled step variant."""
    local = max(2, min(int(mel_lengths.min()) // 2 - 1, max_len // 2))
    return host_global_min(local)


def _bucket(n: int, m: int = 4) -> int:
    return max(m, (n // m) * m)


def make_lr_map(cfg: Config) -> Dict[str, float]:
    op = cfg.optimizer_params
    return {"bert": op.bert_lr,
            "decoder": op.ft_lr if cfg.pretrained_model else op.lr,
            "style_encoder": op.ft_lr if cfg.pretrained_model else op.lr}


def run_stage1(
    cfg: Config,
    configs: Dict,
    zoo: Dict,
    train_loader,
    val_loader=None,
    mesh=None,
    max_steps: Optional[int] = None,
    log_cb: Optional[Callable[[int, Dict], None]] = None,
    resume_from: Optional[str] = None,
) -> TrainState:
    mesh = mesh or make_mesh()
    opt = MultiOptimizer(zoo, make_lr_map(cfg), default_lr=cfg.optimizer_params.lr)
    trainer = Stage1Trainer(cfg, configs, opt)
    state = TrainState(replicate_params(zoo, mesh), None)
    state.opt_states = replicate_params(opt.init(zoo), mesh)
    if resume_from:
        # full resume: params + optimizer states + counters
        # (ref: models.py:1231-1238 load_only_params=False semantics)
        params, opt_states, epoch0, iters0, _ = load_checkpoint(
            resume_from, zoo, opt_template=opt.init(zoo))
        state.params = replicate_params(params, mesh)
        if opt_states is not None:
            state.opt_states = replicate_params(opt_states, mesh)
        state.epoch, state.iters = epoch0, iters0
        logger.info("resumed stage1 from %s at epoch %d, iter %d",
                    resume_from, epoch0, iters0)

    steps_done = 0
    key = jax.random.PRNGKey(0)
    step_cache: Dict = {}
    with mesh:
        for epoch in range(state.epoch, cfg.epochs_1st):
            tma = epoch >= cfg.loss_params.TMA_epoch
            t0 = time.time()
            for i, batch in enumerate(train_loader(epoch)):
                mel_len = _bucket(_clip_lengths(batch["mel_input_length"], cfg.max_len))
                if mel_len < 40:
                    # style encoder needs >= 80 mel frames (ref: train_first.py:378-379)
                    continue
                skey = (tma, mel_len)
                if skey not in step_cache:
                    step_cache[skey] = trainer.make_step(tma, mel_len, mel_len)
                out = step_cache[skey](state.params, state.opt_states,
                                       shard_batch(batch, mesh),
                                       jax.random.fold_in(key, state.iters))
                state.params, state.opt_states = out.params, out.opt_states
                state.iters += 1
                steps_done += 1
                if log_cb and state.iters % cfg.log_interval == 0:
                    log_cb(state.iters, {k: float(v) for k, v in out.metrics.items()})
                if max_steps and steps_done >= max_steps:
                    return state
            state.epoch = epoch + 1
            logger.info("stage1 epoch %d done in %.1fs", epoch, time.time() - t0)
            if val_loader is not None:
                _run_validation(cfg, configs, state, val_loader, epoch, log_cb,
                                stage=1, mesh=mesh)
            if cfg.log_dir and (epoch + 1) % cfg.save_freq == 0 and is_main_process():
                # meta stores state.epoch (= next epoch to run) so a resume
                # picks up exactly where this save left off; host-0 only
                # (ref: accelerator.is_main_process, train_first.py:545-556)
                save_checkpoint(os.path.join(cfg.log_dir, f"epoch_1st_{epoch:05d}.npz"),
                                state.params, state.opt_states, state.epoch,
                                state.iters)
    if cfg.log_dir and is_main_process():
        save_checkpoint(os.path.join(cfg.log_dir, cfg.first_stage_path),
                        state.params, state.opt_states, state.epoch, state.iters)
    return state


def run_stage2(
    cfg: Config,
    configs: Dict,
    zoo: Dict,
    train_loader,
    val_loader=None,
    mesh=None,
    max_steps: Optional[int] = None,
    finetune: bool = False,
    log_cb: Optional[Callable[[int, Dict], None]] = None,
    resume_from: Optional[str] = None,
) -> TrainState:
    mesh = mesh or make_mesh()
    opt = MultiOptimizer(zoo, make_lr_map(cfg), default_lr=cfg.optimizer_params.lr)
    trainer = Stage2Trainer(cfg, configs, opt)
    state = TrainState(replicate_params(zoo, mesh), None,
                       sigma_data=cfg.model_params.diffusion.dist.sigma_data)
    state.opt_states = replicate_params(opt.init(zoo), mesh)
    if resume_from:
        params, opt_states, epoch0, iters0, extra = load_checkpoint(
            resume_from, zoo, opt_template=opt.init(zoo))
        state.params = replicate_params(params, mesh)
        if opt_states is not None:
            state.opt_states = replicate_params(opt_states, mesh)
        state.epoch, state.iters = epoch0, iters0
        state.sigma_data = float(extra.get("sigma_data", state.sigma_data))
        logger.info("resumed stage2 from %s at epoch %d, iter %d",
                    resume_from, epoch0, iters0)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    step_cache: Dict = {}
    steps_done = 0
    epochs = cfg.epochs if finetune else cfg.epochs_2nd
    with mesh:
        for epoch in range(state.epoch, epochs):
            diff = finetune or epoch >= cfg.loss_params.diff_epoch
            joint = finetune or epoch >= cfg.loss_params.joint_epoch
            start_ds = finetune or epoch >= cfg.loss_params.diff_epoch
            for i, batch in enumerate(train_loader(epoch)):
                mel_len = _bucket(_clip_lengths(batch["mel_input_length"], cfg.max_len))
                if mel_len < 40:
                    continue
                num_steps = int(rng.integers(3, 5))
                run_disc = joint and ((i + 1) % cfg.slmadv_params.iter == 0)
                use_ind = joint and bool(rng.random() < 0.5)
                # host-level randint draws of the reference disc branch
                # (ref: slmadv.py:214-219, 227, 236)
                use_rec = run_disc and bool(rng.integers(0, 2))
                real_alt = use_rec and bool(rng.integers(0, 2))
                skey = (diff, joint, start_ds, mel_len, num_steps, run_disc,
                        use_ind, use_rec, real_alt)
                if skey not in step_cache:
                    step_cache[skey] = trainer.make_step(
                        diff, joint, start_ds, mel_len, mel_len, num_steps,
                        slm_run_disc=run_disc, slm_use_ind=use_ind,
                        slm_frame_capacity=_bucket(cfg.slmadv_params.max_len, 50),
                        finetune=finetune, slm_use_rec=use_rec,
                        slm_real_alt=real_alt)
                out = step_cache[skey](state.params, state.opt_states,
                                       shard_batch(batch, mesh),
                                       jax.random.fold_in(key, state.iters),
                                       jnp.float32(state.sigma_data))
                state.params, state.opt_states = out.params, out.opt_states
                state.sigma_data = float(out.sigma_data)
                state.iters += 1
                steps_done += 1
                if log_cb and state.iters % cfg.log_interval == 0:
                    log_cb(state.iters, {k: float(v) for k, v in out.metrics.items()})
                if max_steps and steps_done >= max_steps:
                    return state
            state.epoch = epoch + 1
            if val_loader is not None:
                _run_validation(cfg, configs, state, val_loader, epoch, log_cb,
                                stage=2, mesh=mesh)
            if cfg.log_dir and (epoch + 1) % cfg.save_freq == 0 and is_main_process():
                tag = "ft" if finetune else "2nd"
                save_checkpoint(os.path.join(cfg.log_dir, f"epoch_{tag}_{epoch:05d}.npz"),
                                state.params, state.opt_states, state.epoch,
                                state.iters, extra={"sigma_data": state.sigma_data})
    if cfg.log_dir and is_main_process():
        tag = "ft" if finetune else "2nd"
        save_checkpoint(os.path.join(cfg.log_dir, f"{tag}_stage.npz"),
                        state.params, state.opt_states, state.epoch, state.iters,
                        extra={"sigma_data": state.sigma_data})
    return state


def _run_validation(cfg, configs, state, val_loader, epoch, log_cb, stage: int,
                    mesh=None):
    """Per-epoch validation + qualitative sample dumps
    (ref: train_first.py:457-545, train_second.py:949-1193)."""
    from .validate import make_stage1_val_step, make_stage2_val_step

    make = make_stage1_val_step if stage == 1 else make_stage2_val_step
    totals: Dict[str, float] = {}
    count = 0
    step_cache: Dict = {}
    first_batch = None
    for batch in val_loader(epoch):
        mel_len = _bucket(_clip_lengths(batch["mel_input_length"], cfg.max_len))
        if mel_len < 40:
            continue
        if first_batch is None:
            first_batch = batch
        if mel_len not in step_cache:
            step_cache[mel_len] = make(cfg, configs, mel_len)
        dev_batch = shard_batch(batch, mesh) if mesh is not None else batch
        out = step_cache[mel_len](state.params, dev_batch,
                                  jax.random.PRNGKey(epoch))
        for k, v in out.items():
            totals[k] = totals.get(k, 0.0) + float(v)
        count += 1
    if count and log_cb:
        log_cb(state.iters, {f"val_{k}": v / count for k, v in totals.items()})
    if (first_batch is not None and cfg.log_dir
            and (epoch + 1) % cfg.save_freq == 0 and is_main_process()):
        try:
            from .samples import generate_samples

            generate_samples(state.params, configs, first_batch,
                             os.path.join(cfg.log_dir, "samples", f"epoch_{epoch:05d}"))
        except Exception as exc:   # sample dumps must never kill training
            logger.warning("sample generation failed: %s", exc)
