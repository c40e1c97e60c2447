#!/usr/bin/env python3
"""Extract averaged WavLM weights from finetuned diarization checkpoints.

Reference parity: recipes/diar_ssl_pruning/get_wavlm_from_finetuned.py — the
fine-tune-before-prune workflow averages the N best diarization checkpoints
and saves just the WavLM trunk (as `params.npz` + `config.json`) for the
distill-prune stage's teacher/student init.

Usage:
    python get_wavlm_from_finetuned.py --exp_dir exp/wavlm_updated_conformer \
        --wavlm_src wavlm_base --out_dir wavlm_finetuned/ --avg_ckpt_num 5
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

from diarizen_tpu.models.build import _load_wavlm
from diarizen_tpu.train.checkpoint import (
    average_checkpoints,
    load_metrics,
    save_pytree,
    select_checkpoints,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_dir", required=True)
    parser.add_argument("--wavlm_src", default="wavlm_base")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--avg_ckpt_num", type=int, default=5)
    parser.add_argument("--avg_metric", default="loss")
    args = parser.parse_args()

    exp_dir = Path(args.exp_dir)
    metrics = load_metrics(exp_dir)
    ckpts = select_checkpoints(
        metrics, exp_dir / "checkpoints", num=args.avg_ckpt_num, metric=args.avg_metric
    )
    assert ckpts, "no checkpoints found"
    print(f"averaging {[c.name for c in ckpts]}")
    params = average_checkpoints(ckpts)
    assert "wavlm" in params, "checkpoint has no wavlm trunk"

    cfg, _ = _load_wavlm(args.wavlm_src)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_pytree(out / "params.npz", params["wavlm"])
    (out / "config.json").write_text(json.dumps(dataclasses.asdict(cfg), indent=2))
    print(f"saved WavLM trunk to {out}")


if __name__ == "__main__":
    main()
