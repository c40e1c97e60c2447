#!/usr/bin/env python3
"""Collapse HardConcrete gates of a distill-prune run into a smaller WavLM.

Reference parity: recipes/diar_ssl_pruning/apply_pruning.py:30-131 — select
the N best-loss checkpoints AFTER the loss peak (pruning destabilizes loss
first; post-peak = sparsity stabilized), average them, run the prune surgery,
and save `{params, config}` plus a params/MACs report.

Usage:
    python apply_pruning.py -C conf/s80_base.toml --out_dir pruned/
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("DIARIZEN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIARIZEN_PLATFORM"])

import numpy as np

from diarizen_tpu.config import load_toml
from diarizen_tpu.models.build import _load_wavlm
from diarizen_tpu.models.wavlm import count_macs, init_wavlm_params
from diarizen_tpu.prune import apply_pruning, count_params_pytree
from diarizen_tpu.train.checkpoint import (
    average_checkpoints,
    list_checkpoints,
    load_metrics,
    load_pytree,
    save_pytree,
)


def select_post_peak(metrics, ckpt_root, num=5, metric="loss"):
    """Best-N checkpoints after the loss peak (apply_pruning.py:40-50)."""
    existing = {int(p.name.split("_")[1]): p for p in list_checkpoints(ckpt_root)}
    rows = [m for m in metrics if m.get("epoch") in existing and metric in m]
    if not rows:
        return []
    rows = sorted(rows, key=lambda m: m["epoch"])
    peak_i = int(np.argmax([m[metric] for m in rows]))
    post = sorted(rows[peak_i:], key=lambda m: m[metric])[:num]
    return [existing[m["epoch"]] for m in post]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--avg_ckpt_num", type=int, default=5)
    args = parser.parse_args()

    config_path = Path(args.configuration).resolve()
    config = load_toml(config_path)
    exp_dir = Path(config.get("meta", {}).get("save_dir", "exp")) / config_path.stem
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    wavlm_cfg, _ = _load_wavlm(config["model"]["args"]["wavlm_src"])

    metrics = load_metrics(exp_dir)
    ckpts = select_post_peak(metrics, exp_dir / "checkpoints", num=args.avg_ckpt_num)
    assert ckpts, "no checkpoints found"
    print(f"averaging {[c.name for c in ckpts]}")
    avg = average_checkpoints(ckpts)

    teacher_params = count_params_pytree(avg["student"])
    teacher_macs = count_macs(wavlm_cfg)
    pruned_params, pruned_cfg = apply_pruning(
        avg["student"], wavlm_cfg, avg["log_alphas"]
    )
    student_params = count_params_pytree(pruned_params)
    student_macs = count_macs(pruned_cfg)

    save_pytree(out_dir / "params.npz", pruned_params)
    (out_dir / "config.json").write_text(
        json.dumps(dataclasses.asdict(pruned_cfg), indent=2)
    )
    report = {
        "original_params_M": teacher_params / 1e6,
        "pruned_params_M": student_params / 1e6,
        "sparsity": 1 - student_params / teacher_params,
        "original_macs_G_per_s": teacher_macs / 1e9,
        "pruned_macs_G_per_s": student_macs / 1e9,
        "checkpoints": [c.name for c in ckpts],
    }
    (out_dir / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
