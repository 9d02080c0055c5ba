#!/usr/bin/env python
"""Stage-1 training CLI (ref: train_first.py).

Usage: python train_stage1.py --config_path configs/ljspeech.yml
"""

import argparse
import logging
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_path", default="configs/ljspeech.yml")
    ap.add_argument("--max_steps", type=int, default=None)
    args = ap.parse_args()

    import jax

    from styletts2_tpu.config import load_config
    from styletts2_tpu.data import build_dataloader
    from styletts2_tpu.models.zoo import build_zoo, zoo_configs
    from styletts2_tpu.train.checkpoint import (
        convert_reference_checkpoint, load_checkpoint, zoo_to_device)
    from styletts2_tpu.train.loop import run_stage1

    logging.basicConfig(level=logging.INFO)
    cfg = load_config(args.config_path)
    os.makedirs(cfg.log_dir, exist_ok=True)

    with open(cfg.data_params.train_data, encoding="utf-8", errors="ignore") as f:
        train_list = f.readlines()
    with open(cfg.data_params.val_data, encoding="utf-8", errors="ignore") as f:
        val_list = f.readlines()

    train_loader = build_dataloader(
        train_list, cfg.data_params.root_path, OOD_data=cfg.data_params.OOD_data,
        min_length=cfg.data_params.min_length, batch_size=cfg.batch_size)
    val_loader = build_dataloader(
        val_list, cfg.data_params.root_path, validation=True,
        OOD_data=cfg.data_params.OOD_data, batch_size=cfg.batch_size)

    configs = zoo_configs(cfg.model_params)
    zoo = build_zoo(jax.random.PRNGKey(0), cfg.model_params)

    # load pretrained aux models / resume
    for name, path in [("text_aligner", cfg.ASR_path), ("pitch_extractor", cfg.F0_path)]:
        if path and os.path.exists(path):
            sub = convert_reference_checkpoint(path, {name: zoo[name]})
            zoo[name] = sub.get(name, next(iter(sub.values())))
    if cfg.pretrained_model and os.path.exists(cfg.pretrained_model):
        if cfg.pretrained_model.endswith(".pth"):
            zoo.update(convert_reference_checkpoint(cfg.pretrained_model, zoo))
        else:
            params, _, _, _ = load_checkpoint(cfg.pretrained_model, zoo)
            zoo.update(params)
    zoo = zoo_to_device(zoo)

    def log_cb(step, metrics):
        logging.info("step %d | %s", step,
                     " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    run_stage1(cfg, configs, zoo, train_loader, val_loader,
               max_steps=args.max_steps, log_cb=log_cb)


if __name__ == "__main__":
    main()
