#!/usr/bin/env python
"""Stage-1 training CLI (ref: train_first.py).

Usage: python train_stage1.py --config_path configs/ljspeech.yml
"""

import argparse
import glob
import logging
import os


def find_resume_checkpoint(log_dir: str, stage_tag: str):
    """Latest ``epoch_{tag}_*.npz`` in the run directory, if any."""
    paths = sorted(glob.glob(os.path.join(log_dir, f"epoch_{stage_tag}_*.npz")))
    return paths[-1] if paths else None


def grow_n_token(cfg):
    """Auto-grow the model vocab from a custom phoneme dictionary
    (ref: train_first.py:237-246, models.py:989-996)."""
    import dataclasses

    from styletts2_tpu.text.dictionary import (
        infer_phoneme_dictionary_token_count,
        resolve_phoneme_dictionary_settings,
    )

    dp = cfg.data_params
    source, dict_cfg = resolve_phoneme_dictionary_settings(
        {"phoneme_dict_path": dp.phoneme_dict_path,
         "phoneme_dictionary_config": dp.phoneme_dictionary_config})
    n = infer_phoneme_dictionary_token_count(source, dict_cfg)
    if n and n > cfg.model_params.n_token:
        logging.info("growing n_token %d -> %d from phoneme dictionary",
                     cfg.model_params.n_token, n)
        cfg = dataclasses.replace(
            cfg, model_params=dataclasses.replace(cfg.model_params, n_token=n))
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", default="configs/ljspeech.yml")
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--resume", default=None,
                    help="checkpoint to resume from (default: latest epoch_1st_* in log_dir)")
    ap.add_argument("--no_resume", action="store_true",
                    help="ignore existing epoch checkpoints, start fresh")
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
    from styletts2_tpu.train.loop import run_stage1
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

    # mid-run resume takes precedence over pretrained-model init
    resume_from = None
    if not args.no_resume:
        resume_from = args.resume or find_resume_checkpoint(cfg.log_dir, "1st")
        if resume_from is None and cfg.pretrained_model and \
                not cfg.load_only_params and \
                not cfg.pretrained_model.endswith(".pth") and \
                os.path.exists(cfg.pretrained_model):
            resume_from = cfg.pretrained_model

    # pretrained frozen encoders (ASR/F0/PL-BERT/Whisper) are the base init;
    # any resume/pretrained checkpoint below overwrites where present
    # (ref: train_first.py:208-227, losses.py:204-214)
    loaded = load_pretrained_encoders(cfg, zoo)
    for name, src in loaded.items():
        logging.info("loaded pretrained %s from %s", name, src)
    if resume_from is None and cfg.pretrained_model and os.path.exists(cfg.pretrained_model):
        if cfg.pretrained_model.endswith(".pth"):
            zoo.update(convert_reference_checkpoint(cfg.pretrained_model, zoo))
        else:
            params, _, _, _, _ = load_checkpoint(cfg.pretrained_model, zoo)
            zoo.update(params)
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
        run_stage1(cfg, configs, zoo, train_loader, val_loader,
                   max_steps=args.max_steps, log_cb=log_cb,
                   resume_from=resume_from)
    finally:
        if writer is not None:
            writer.close()


if __name__ == "__main__":
    main()
