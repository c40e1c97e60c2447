#!/usr/bin/env python3
"""Joint distillation + structured pruning of a WavLM encoder.

Reference parity: recipes/diar_ssl_pruning/run_distill_prune.py +
trainer_distill_prune.py — teacher/student share an init checkpoint, the
student carries HardConcrete gates, training minimizes distillation loss +
Lagrangian sparsity penalty; `--further_distill` freezes sparsity targets
and continues distilling a pruned model.

Usage:
    python run_distill_prune.py -C conf/s80_base.toml [--further_distill]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("DIARIZEN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIARIZEN_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from diarizen_tpu.config import load_toml
from diarizen_tpu.logger import init_logging, log_config
from diarizen_tpu.models.build import _load_wavlm
from diarizen_tpu.models.wavlm import init_wavlm_params
from diarizen_tpu.ops.flash_attention import softmax_mode_scope
from diarizen_tpu.prune import (
    DistillConfig,
    PruneConfig,
    create_distill_prune_state,
    init_gates,
    make_distill_prune_optimizer,
    make_distill_prune_step,
)
from diarizen_tpu.train.checkpoint import append_metrics, save_checkpoint
from diarizen_tpu.train.dataset import DataLoader, DiarizationDataset


def run(config: dict, exp_dir: Path, further_distill: bool = False) -> None:
    logger = init_logging(exp_dir)
    log_config(logger, config)
    margs = config["model"]["args"]
    seed = config.get("meta", {}).get("seed", 3407)

    wavlm_cfg, wavlm_params = _load_wavlm(margs["wavlm_src"])
    if wavlm_params is None:
        wavlm_params = init_wavlm_params(jax.random.PRNGKey(seed), wavlm_cfg)
    teacher = jax.tree_util.tree_map(jnp.asarray, wavlm_params)
    student = jax.tree_util.tree_map(jnp.copy, teacher)

    pcfg = PruneConfig(
        prune_conv_channels=margs.get("prune_conv_channels", False),
        prune_attention_heads=margs.get("prune_attention_heads", True),
        prune_attention_layer=margs.get("prune_attention_layer", True),
        prune_feed_forward_intermediate=margs.get("prune_feed_forward_intermediate", True),
        prune_feed_forward_layer=margs.get("prune_feed_forward_layer", True),
    )
    gates = init_gates(jax.random.PRNGKey(seed + 1), wavlm_cfg, pcfg)

    targs = config["trainer"]["args"]
    ds_args = config["train_dataset"]["args"]
    dataset = DiarizationDataset(
        scp_file=ds_args["scp_file"], rttm_file=ds_args["rttm_file"],
        uem_file=ds_args["uem_file"],
        model_num_frames=wavlm_cfg.num_frames(int(ds_args.get("chunk_size", 8) * 16000)),
        model_rf_duration=0.025, model_rf_step=0.02,
        chunk_size=ds_args.get("chunk_size", 8),
        chunk_shift=ds_args.get("chunk_shift", 8),
    )
    loader = DataLoader(
        dataset,
        batch_size=config["train_dataset"]["dataloader"]["batch_size"],
        shuffle=True, seed=seed,
    )
    steps_per_epoch = max(len(loader), 1)

    dcfg = DistillConfig(
        l2_weight=targs.get("l2_weight", 0.0),
        l1_weight=targs.get("l1_weight", 1.0),
        cos_weight=targs.get("cos_weight", 1.0),
        distill_layers=tuple(targs.get("distill_layers", [0, 4, 8, 12])),
        target_sparsity=0.0 if further_distill else targs.get("target_sparsity", 0.8),
        pre_train_updates=targs.get("pre_train_epochs", 0) * steps_per_epoch,
        sparsity_warmup_updates=targs.get("sparsity_warmup_epochs", 5) * steps_per_epoch,
        distill_lr=targs.get("distill_lr", 2e-4),
        reg_lr=targs.get("reg_lr", 2e-2),
        use_reg=not further_distill,
    )
    optimizer = make_distill_prune_optimizer(dcfg)
    state = create_distill_prune_state(student, gates, optimizer)
    step = jax.jit(
        make_distill_prune_step(wavlm_cfg, dcfg, teacher, optimizer),
        donate_argnums=(0,),
    )

    rng = jax.random.PRNGKey(seed)
    max_epochs = targs.get("max_epochs", 30)
    for epoch in range(max_epochs):
        loader.set_epoch(epoch)
        t0 = time.time()
        losses = []
        for batch in loader:
            xs = batch["xs"][:, 0, :]  # SDM channel
            if xs.dtype == np.int16:  # compact transport (train/step.py)
                xs = xs.astype(np.float32) / 32768.0
            # f32 flash softmax for the teacher's train=False forward:
            # distill targets must share the student's exact numerics
            with softmax_mode_scope("f32"):
                state, metrics = step(state, jnp.asarray(xs), rng)
            losses.append(float(metrics["loss"]))
        record = {
            "epoch": epoch,
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "sparsity_expected": float(metrics["sparsity_expected"]),
            "sparsity_target": float(metrics["sparsity_target"]),
            "lambda1": float(metrics["lambda1"]),
            "epoch_seconds": time.time() - t0,
        }
        append_metrics(exp_dir, record)
        logger.info("epoch %d: %s", epoch, json.dumps(record))
        save_checkpoint(
            exp_dir / "checkpoints", epoch,
            {"student": state.student, "log_alphas": state.log_alphas,
             "lambdas": state.lambdas},
            {}, meta=record, max_keep=targs.get("max_num_checkpoints", 100),
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("--further_distill", action="store_true")
    args = parser.parse_args()
    config_path = Path(args.configuration).resolve()
    config = load_toml(config_path)
    exp_dir = Path(config.get("meta", {}).get("save_dir", "exp")) / config_path.stem
    run(config, exp_dir, further_distill=args.further_distill)
