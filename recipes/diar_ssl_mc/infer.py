#!/usr/bin/env python3
"""Multi-channel checkpoint-averaged inference + DER scoring.

Reference parity: recipes/diar_ssl_mc/infer_avg.py — MC segmentation over all
channels, per-channel embeddings fused with spatial-attention channel
weights, VBx (or AHC) clustering, DER report.

Usage:
    python infer.py -C conf/wavlm_mc_chatt.toml --exp_dir exp/wavlm_mc_chatt \
        --wav_scp data/test/wav.scp --ref_rttm data/test/rttm --out_dir out/ \
        --num_channels 8 [--embedding_ckpt wespeaker.bin]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

if os.environ.get("DIARIZEN_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["DIARIZEN_PLATFORM"])

import numpy as np

from diarizen_tpu.cluster import AgglomerativeClustering, VBxClustering
from diarizen_tpu.config import instantiate_model_for_inference, load_toml
from diarizen_tpu.core.audio import read_audio
from diarizen_tpu.core.io_rttm import load_rttm, load_scp
from diarizen_tpu.infer.mc_pipeline import McDiarizationPipeline, McSlidingInference
from diarizen_tpu.infer.pipeline import EmbeddingInference
from diarizen_tpu.logger import init_logging
from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params, resnet_params_from_torch
from diarizen_tpu.ops.der import DERReport, der_report
from diarizen_tpu.train.checkpoint import average_checkpoints, load_metrics, select_checkpoints


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("--exp_dir", required=True)
    parser.add_argument("--wav_scp", required=True)
    parser.add_argument("--ref_rttm", default=None)
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--num_channels", type=int, default=8)
    parser.add_argument("--avg_ckpt_num", type=int, default=5)
    parser.add_argument("--avg_mode", default="best")
    parser.add_argument("--avg_metric", default="loss")
    parser.add_argument("--embedding_ckpt", default=None)
    parser.add_argument("--max_files", type=int, default=None)
    args = parser.parse_args()

    config = load_toml(args.configuration)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    init_logging(out_dir, filename="infer.log")

    # averaged checkpoints overwrite every weight below, so a
    # training-time wavlm_src path that doesn't resolve on this host may
    # fall back to the preset architecture (warn-and-proceed)
    cfg, params, state = instantiate_model_for_inference(
        config["model"]["path"], config["model"].get("args", {})
    )
    fcfg = cfg.fusion
    metrics = load_metrics(Path(args.exp_dir))
    ckpts = select_checkpoints(
        metrics, Path(args.exp_dir) / "checkpoints", num=args.avg_ckpt_num,
        metric=args.avg_metric, mode=args.avg_mode,
    )
    if not ckpts:
        raise RuntimeError(
            f"no checkpoints selected from {args.exp_dir}/checkpoints "
            f"(metric={args.avg_metric!r}, mode={args.avg_mode!r}): check "
            "--exp_dir and that metrics.jsonl exists"
        )
    params = average_checkpoints(ckpts)
    print(f"averaged {len(ckpts)} checkpoints")

    inference_args = config.get("inference", {}).get("args", {})
    seg_inf = McSlidingInference(
        params, state, cfg, fcfg, num_channels=args.num_channels,
        duration=float(inference_args.get("seg_duration", 8)),
        batch_size=inference_args.get("batch_size", 16),
    )

    rcfg = ResNetConfig()
    if args.embedding_ckpt:
        import torch

        sd = torch.load(args.embedding_ckpt, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        rparams = resnet_params_from_torch(sd, rcfg)
    else:
        print("WARNING: random embedding weights (smoke mode)")
        rparams = jax.jit(lambda k: init_resnet_params(k, rcfg))(jax.random.PRNGKey(0))
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk,
        batch_size=inference_args.get("batch_size", 16),
    )

    cl = config.get("clustering", {}).get("args", {})
    if cl.get("method", "VBxClustering") in ("VBx", "VBxClustering"):
        clustering = VBxClustering(
            plda_dir=cl.get("plda_dir", ""),
            ahc_threshold=cl.get("ahc_threshold", 0.6),
            fa=cl.get("Fa", 0.06), fb=cl.get("Fb", 0.9),
            lda_dim=cl.get("lda_dim", 128), max_iters=cl.get("max_iters", 20),
        )
    else:
        clustering = AgglomerativeClustering(
            threshold=cl.get("ahc_threshold", 0.70),
            min_cluster_size=cl.get("min_cluster_size", 30),
        )

    pipeline = McDiarizationPipeline(
        seg_inference=seg_inf, emb_inference=emb_inf, clustering=clustering,
        eend_cfg=cfg,
        min_speakers=cl.get("min_speakers", 1),
        max_speakers=cl.get("max_speakers", 8),
        apply_median_filtering=inference_args.get("apply_median_filtering", True),
    )

    scp = load_scp(args.wav_scp)
    hyps = {}
    for uri, path in list(scp.items())[: args.max_files]:
        wave, sr = read_audio(path)
        c = wave.shape[0]
        if c < args.num_channels:  # wrap-pad channels (dataset parity)
            wave = np.pad(wave, ((0, args.num_channels - c), (0, 0)), mode="wrap")
        ann = pipeline(wave[: args.num_channels], sr, uri=uri)
        hyps[uri] = ann
        (out_dir / f"{uri}.rttm").write_text(ann.to_rttm())
        print(f"{uri}: {len(ann.labels())} speakers")

    if args.ref_rttm:
        refs = load_rttm(args.ref_rttm)
        total = DERReport(0.0, 0.0, 0.0, 0.0)
        for u, hyp in hyps.items():
            if u in refs:
                total = total + der_report(refs[u], hyp)
        summary = {"der": total.der}
        (out_dir / "der.json").write_text(json.dumps(summary, indent=2))
        print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
