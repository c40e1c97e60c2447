#!/usr/bin/env python3
"""Train / validate a diarization segmentation model from a TOML config.

Reference parity: recipes/diar_ssl/run_dual_opt.py + run_single_opt.py —
builds the model via the config's `[model]` section, injects the model's
receptive-field info into the datasets, builds the dual-LR (or single-LR)
optimizer and the Trainer, then trains or validates.

Usage:
    python run.py -C conf/wavlm_updated_conformer.toml -M train
    python run.py -C conf/wavlm_updated_conformer.toml -M validate
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import os

import jax

# the axon sitecustomize overrides JAX_PLATFORMS env at interpreter start;
# DIARIZEN_PLATFORM forces a platform via jax.config (works pre-backend-init)
if os.environ.get("DIARIZEN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIARIZEN_PLATFORM"])

import numpy as np

from diarizen_tpu.config import dump_toml, instantiate, load_toml
from diarizen_tpu.logger import init_logging, log_config
from diarizen_tpu.models.eend import non_wavlm_param_labels
from diarizen_tpu.train.checkpoint import average_checkpoints, load_metrics, select_checkpoints
from diarizen_tpu.train.dataset import DataLoader, DiarizationDataset
from diarizen_tpu.train.optim import adamw_with_warmup, dual_lr_optimizer
from diarizen_tpu.train.trainer import Trainer, TrainerConfig


def build_dataset(section: dict, cfg) -> DiarizationDataset:
    step, duration = cfg.rf_info()
    num_samples = int(section["args"].get("chunk_size", cfg.chunk_size) * cfg.sample_rate)
    return DiarizationDataset(
        scp_file=section["args"]["scp_file"],
        rttm_file=section["args"]["rttm_file"],
        uem_file=section["args"]["uem_file"],
        model_num_frames=cfg.num_frames(num_samples),
        model_rf_duration=duration,
        model_rf_step=step,
        chunk_size=section["args"].get("chunk_size", 8),
        chunk_shift=section["args"].get("chunk_shift", 6),
        sample_rate=section["args"].get("sample_rate", 16000),
        num_channels=section["args"].get("num_channels", 1),
        channel_mode=section["args"].get("channel_mode", "sdm"),
    )


def run(config: dict, mode: str, exp_dir: Path) -> None:
    logger = init_logging(exp_dir)
    log_config(logger, config)
    dump_toml(config, exp_dir / "config.toml")
    seed = config.get("meta", {}).get("seed", 3407)

    cfg, params, state = instantiate(
        config["model"]["path"], config["model"].get("args", {}), seed=seed
    )

    finetune = config.get("finetune", {})
    if finetune.get("finetune"):
        ckpt_dirs = finetune.get("checkpoints") or []
        if ckpt_dirs:
            params = average_checkpoints(ckpt_dirs)
            logger.info("finetuning from averaged %d checkpoints", len(ckpt_dirs))

    trainer_args = config.get("trainer", {}).get("args", {})
    freeze_wavlm = trainer_args.get("freeze_wavlm", False)
    if "optimizer_small" in config or freeze_wavlm:
        # freeze_wavlm with a single [optimizer] (the reference frozen recipe)
        # still needs the param split: trunk updates zeroed, head at lr
        big = config.get("optimizer_big") or config.get("optimizer", {})
        small = config.get("optimizer_small", {}).get("args", {})
        optimizer = dual_lr_optimizer(
            non_wavlm_param_labels(jax.tree_util.tree_map(np.asarray, params)),
            lr_small=small.get("lr", 2e-5),
            lr_big=big.get("args", {}).get("lr", 1e-3),
            warmup_steps=trainer_args.get("warmup_steps", 0),
            clip_percentile=trainer_args.get("gradient_percentile", 90),
            freeze_wavlm=freeze_wavlm,
        )
    else:
        optimizer = adamw_with_warmup(
            config["optimizer"]["args"].get("lr", 1e-3),
            warmup_steps=trainer_args.get("warmup_steps", 0),
            clip_percentile=trainer_args.get("gradient_percentile", 90),
        )

    accum = trainer_args.get("gradient_accumulation_steps", 1)
    if accum > 1:
        from diarizen_tpu.train.optim import with_gradient_accumulation

        optimizer = with_gradient_accumulation(optimizer, accum)

    tc = TrainerConfig(
        exp_dir=str(exp_dir),
        max_epochs=trainer_args.get("max_epochs", 100),
        patience=trainer_args.get("max_patience", 10),
        max_num_checkpoints=trainer_args.get("max_num_checkpoints", 100),
        validation_interval=trainer_args.get("validation_interval", 1),
        monitor_mode="max" if trainer_args.get("save_max_score") else "min",
        seed=seed,
    )
    trainer = Trainer(cfg, tc, optimizer, params, state)
    trainer.resume()

    train_ds = build_dataset(config["train_dataset"], cfg)
    val_ds = build_dataset(config["validate_dataset"], cfg)
    train_loader = DataLoader(
        train_ds,
        batch_size=config["train_dataset"]["dataloader"]["batch_size"],
        shuffle=True, seed=seed,
        max_speakers_per_chunk=cfg.max_speakers_per_chunk,
    )
    val_loader = DataLoader(
        val_ds,
        batch_size=config["validate_dataset"]["dataloader"]["batch_size"],
        shuffle=False,
        max_speakers_per_chunk=cfg.max_speakers_per_chunk,
    )

    if mode == "train":
        final = trainer.train(train_loader, val_loader)
    else:
        final = trainer.validate(val_loader)
    logger.info("%s done: %s", mode, final)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("-M", "--mode", default="train", choices=["train", "validate"])
    args = parser.parse_args()
    config_path = Path(args.configuration).resolve()
    config = load_toml(config_path)
    exp_dir = Path(config.get("meta", {}).get("save_dir", "exp")) / config_path.stem
    run(config, args.mode, exp_dir)
