#!/usr/bin/env python3
"""Checkpoint-averaged full-pipeline inference + DER scoring.

Reference parity: recipes/diar_ssl/infer_avg.py — select the N best / last /
centered checkpoints from the validation metric summary, average their
weights, run the full diarization pipeline over a wav.scp, write RTTMs, and
score DER (collar 0) against a reference RTTM (replacing the external dscore
stage, run_stage.sh:85-92, with ops/der).

Usage:
    python infer.py -C conf/wavlm_updated_conformer.toml \
        --exp_dir exp/wavlm_updated_conformer \
        --wav_scp data/AMI/test/wav.scp --ref_rttm data/AMI/test/rttm \
        --out_dir exp/infer/AMI --avg_ckpt_num 5 --avg_mode best \
        [--embedding_ckpt wespeaker.bin] [--clustering AHC]
"""

from __future__ import annotations

import argparse
import json
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

from diarizen_tpu.cluster import AgglomerativeClustering, VBxClustering
from diarizen_tpu.config import instantiate_model_for_inference, load_toml
from diarizen_tpu.core.audio import read_audio
from diarizen_tpu.core.io_rttm import load_rttm, load_scp
from diarizen_tpu.infer import DiarizationPipeline, EmbeddingInference, SlidingInference
from diarizen_tpu.logger import init_logging
from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params, resnet_params_from_torch
from diarizen_tpu.ops.der import der_report
from diarizen_tpu.train.checkpoint import average_checkpoints, load_metrics, select_checkpoints


def build_pipeline(args, config):
    # averaged checkpoints overwrite every weight below, so a
    # training-time wavlm_src path that doesn't resolve on this host may
    # fall back to the preset architecture (warn-and-proceed)
    cfg, params, state = instantiate_model_for_inference(
        config["model"]["path"], config["model"].get("args", {})
    )

    exp_dir = Path(args.exp_dir)
    metrics = load_metrics(exp_dir)
    ckpts = select_checkpoints(
        metrics, exp_dir / "checkpoints", num=args.avg_ckpt_num,
        metric=args.avg_metric, mode=args.avg_mode,
    )
    if not ckpts:
        # the model may have been built on the preset-architecture fallback
        # (random init) — scoring without checkpoint weights would silently
        # emit garbage RTTMs (r5 code review)
        raise RuntimeError(
            f"no checkpoints selected from {exp_dir}/checkpoints "
            f"(metric={args.avg_metric!r}, mode={args.avg_mode!r}): check "
            "--exp_dir and that metrics.jsonl exists"
        )
    params = average_checkpoints(ckpts)
    print(f"averaged {len(ckpts)} checkpoints: {[c.name for c in ckpts]}")

    inference_args = config.get("inference", {}).get("args", {})
    seg_duration = inference_args.get("seg_duration", 8)
    batch_size = inference_args.get("batch_size", 32)

    seg_inf = SlidingInference(
        params, state, cfg,
        duration=float(seg_duration),
        step=0.1 * float(seg_duration),
        batch_size=batch_size,
    )

    rcfg = ResNetConfig()
    if args.embedding_ckpt:
        import torch

        sd = torch.load(args.embedding_ckpt, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        rparams = resnet_params_from_torch(sd, rcfg)
    else:
        print("WARNING: no --embedding_ckpt; random embedding weights (smoke mode)")
        rparams = jax.jit(lambda k: init_resnet_params(k, rcfg))(jax.random.PRNGKey(0))
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=batch_size,
    )

    cl_args = config.get("clustering", {}).get("args", {})
    method = args.clustering or cl_args.get("method", "AgglomerativeClustering")
    if method in ("AHC", "AgglomerativeClustering"):
        clustering = AgglomerativeClustering(
            threshold=cl_args.get("ahc_threshold", 0.70),
            min_cluster_size=cl_args.get("min_cluster_size", 30),
            method=cl_args.get("linkage", "centroid"),
        )
    elif method in ("VBx", "VBxClustering"):
        clustering = VBxClustering(
            plda_dir=cl_args["plda_dir"],
            ahc_criterion=cl_args.get("ahc_criterion", "distance"),
            ahc_threshold=cl_args.get("ahc_threshold", 0.6),
            fa=cl_args.get("Fa", 0.07),
            fb=cl_args.get("Fb", 0.8),
            lda_dim=cl_args.get("lda_dim", 128),
            max_iters=cl_args.get("max_iters", 20),
        )
    else:
        raise ValueError(f"unknown clustering {method}")

    return DiarizationPipeline(
        seg_inference=seg_inf,
        emb_inference=emb_inf,
        clustering=clustering,
        eend_cfg=cfg,
        min_speakers=cl_args.get("min_speakers", 1),
        max_speakers=cl_args.get("max_speakers", 8),
        apply_median_filtering=inference_args.get("apply_median_filtering", True),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("--exp_dir", required=True)
    parser.add_argument("--wav_scp", required=True)
    parser.add_argument("--ref_rttm", default=None)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--avg_ckpt_num", type=int, default=5)
    parser.add_argument("--avg_mode", default="best", choices=["best", "prev", "center"])
    parser.add_argument("--avg_metric", default="loss")
    parser.add_argument("--embedding_ckpt", default=None)
    parser.add_argument("--clustering", default=None)
    parser.add_argument("--max_files", type=int, default=None)
    args = parser.parse_args()

    config = load_toml(args.configuration)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    init_logging(out_dir, filename="infer.log")

    pipeline = build_pipeline(args, config)

    scp = load_scp(args.wav_scp)
    items = list(scp.items())[: args.max_files]
    hyps = {}

    # streamed mode: file i+1's device compute is dispatched before file i's
    # host stages run, so stitching/clustering/RTTM io hide behind the chip
    # (identical outputs to per-file calls; see DiarizationPipeline.stream)
    def waves():
        for _, path in items:
            wave, sr = read_audio(path)
            assert sr == 16000, f"{path}: expected 16 kHz, got {sr}"
            yield wave

    for (uri, _), ann in zip(items, pipeline.stream(waves(), 16000,
                                                    uris=[u for u, _ in items])):
        hyps[uri] = ann
        (out_dir / f"{uri}.rttm").write_text(ann.to_rttm())
        print(f"{uri}: {len(ann.labels())} speakers")

    if args.ref_rttm:
        refs = load_rttm(args.ref_rttm)
        from diarizen_tpu.ops.der import DERReport

        total = DERReport(0.0, 0.0, 0.0, 0.0)
        per_file = {}
        for u, hyp in hyps.items():
            if u not in refs:
                continue
            r = der_report(refs[u], hyp)
            per_file[u] = {"der": r.der, "fa": r.false_alarm, "miss": r.missed_detection,
                           "conf": r.confusion, "total": r.total}
            total = total + r
        summary = {
            "der": total.der,
            "false_alarm": total.false_alarm / max(total.total, 1e-9),
            "missed_detection": total.missed_detection / max(total.total, 1e-9),
            "confusion": total.confusion / max(total.total, 1e-9),
            "files": per_file,
        }
        (out_dir / "der.json").write_text(json.dumps(summary, indent=2))
        print(json.dumps({k: v for k, v in summary.items() if k != "files"}, indent=2))


if __name__ == "__main__":
    main()
