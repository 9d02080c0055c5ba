#!/usr/bin/env python
"""Stage-2 / finetune training CLI (ref: train_second.py, train_finetune.py).

Usage: python train_stage2.py --config_path configs/ljspeech.yml [--finetune]
"""

import argparse
import logging
import os

from train_stage1 import find_resume_checkpoint, grow_n_token


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", default="configs/ljspeech.yml")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--finetune", action="store_true",
                    help="train_finetune.py recipe: all modules from step 0 + TMA losses")
    ap.add_argument("--resume", default=None,
                    help="checkpoint to resume from (default: latest epoch ckpt in log_dir)")
    ap.add_argument("--no_resume", action="store_true")
    args = ap.parse_args()

    from styletts2_tpu.parallel.distributed import (
        initialize_distributed, is_main_process)

    initialize_distributed()  # no-op unless a multi-host job is configured

    import jax

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from styletts2_tpu.config import load_config
    from styletts2_tpu.data import build_dataloader
    from styletts2_tpu.models.zoo import build_zoo, zoo_configs
    from styletts2_tpu.train.checkpoint import (
        convert_reference_checkpoint, load_checkpoint, load_pretrained_encoders,
        zoo_to_device)
    from styletts2_tpu.train.loop import run_stage2
    from styletts2_tpu.utils import MetricsWriter

    logging.basicConfig(level=logging.INFO if is_main_process() else logging.WARNING)
    cfg = load_config(args.config_path)
    os.makedirs(cfg.log_dir, exist_ok=True)
    cfg = grow_n_token(cfg)

    with open(cfg.data_params.train_data, encoding="utf-8", errors="ignore") as f:
        train_list = f.readlines()
    with open(cfg.data_params.val_data, encoding="utf-8", errors="ignore") as f:
        val_list = f.readlines()

    train_loader = build_dataloader(
        train_list, cfg.data_params.root_path, OOD_data=cfg.data_params.OOD_data,
        min_length=cfg.data_params.min_length, batch_size=cfg.batch_size,
        num_workers=cfg.data_params.num_workers,
        prefetch_batches=cfg.data_params.prefetch_batches)
    val_loader = build_dataloader(
        val_list, cfg.data_params.root_path, validation=True,
        OOD_data=cfg.data_params.OOD_data, batch_size=cfg.batch_size,
        num_workers=min(2, cfg.data_params.num_workers))

    configs = zoo_configs(cfg.model_params)
    zoo = build_zoo(jax.random.PRNGKey(0), cfg.model_params)

    tag = "ft" if args.finetune else "2nd"
    resume_from = None
    if not args.no_resume:
        resume_from = args.resume or find_resume_checkpoint(cfg.log_dir, tag)

    # pretrained frozen encoders (ASR/F0/PL-BERT/Whisper) are the base init;
    # the stage-1/resume checkpoint below overwrites where present
    # (ref: train_second.py:300-326, losses.py:204-214)
    loaded = load_pretrained_encoders(cfg, zoo)
    for name, src in loaded.items():
        logging.info("loaded pretrained %s from %s", name, src)

    if resume_from is None:
        # stage-1 init: load first_stage, copy style_encoder -> predictor_encoder
        # (ref: train_second.py:379-399)
        first_stage = os.path.join(cfg.log_dir, cfg.first_stage_path)
        if cfg.pretrained_model and os.path.exists(cfg.pretrained_model):
            src = cfg.pretrained_model
        elif os.path.exists(first_stage) or os.path.exists(first_stage + ".npz"):
            src = first_stage
        else:
            src = None
        if src:
            if src.endswith(".pth"):
                zoo.update(convert_reference_checkpoint(src, zoo))
            else:
                params, _, _, _, _ = load_checkpoint(src, zoo)
                zoo.update(params)
            if not cfg.second_stage_load_pretrained:
                zoo["predictor_encoder"] = jax.tree_util.tree_map(
                    lambda x: x, zoo["style_encoder"])
    zoo = zoo_to_device(zoo)

    # metric files are written by host 0 only (ref: accelerator.is_main_process)
    writer = MetricsWriter(cfg.log_dir) if is_main_process() else None

    def log_cb(step, metrics):
        if writer is None:
            return
        writer.add_scalars(step, metrics)
        logging.info("step %d | %s", step,
                     " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    try:
        run_stage2(cfg, configs, zoo, train_loader, val_loader,
                   max_steps=args.max_steps, finetune=args.finetune,
                   log_cb=log_cb, resume_from=resume_from)
    finally:
        if writer is not None:
            writer.close()


if __name__ == "__main__":
    main()
