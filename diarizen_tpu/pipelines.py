"""High-level pipeline loader: local pretrained directory -> DiarizationPipeline.

Reference parity: `DiariZenPipeline.from_pretrained`
(diarizen/pipelines/inference.py:26-119) — a model directory contains
`config.toml` (model + inference + clustering sections), the segmentation
checkpoint (`pytorch_model.bin` torch format or `params.npz`), optionally a
`plda/` dir for VBx and a WeSpeaker embedding checkpoint. `from_pretrained`
accepts a local directory OR a Hugging Face repo id (e.g.
"BUT-FIT/DiariZen-Pyannote-*"): hub ids resolve through
`huggingface_hub.snapshot_download` (cache-first, so a pre-populated
HF_HOME works fully offline) with an actionable error when the model is
neither cached nor reachable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax

from diarizen_tpu.cluster import AgglomerativeClustering, VBxClustering
from diarizen_tpu.config import instantiate_model_for_inference, load_toml
from diarizen_tpu.core.audio import read_audio
from diarizen_tpu.infer import DiarizationPipeline, EmbeddingInference, SlidingInference
from diarizen_tpu.models.resnet import (
    ResNetConfig,
    init_resnet_params,
    resnet_params_from_torch,
)


def resolve_model_dir(model_dir_or_repo: str | Path) -> Path:
    """Local directory passes through; anything else is treated as an HF hub
    repo id and resolved via snapshot_download (reference
    `DiariZenPipeline.from_pretrained` pulls the same artifacts off the hub,
    diarizen/pipelines/inference.py:26-119). Cache-first: a repo already in
    HF_HOME loads with no network."""
    p = Path(model_dir_or_repo)
    if p.is_dir():
        return p
    try:
        from huggingface_hub import snapshot_download

        return Path(snapshot_download(repo_id=str(model_dir_or_repo)))
    except Exception as e:  # noqa: BLE001 — fold network/cache errors into one message
        raise FileNotFoundError(
            f"{model_dir_or_repo!r} is neither a local model directory nor a "
            "resolvable Hugging Face repo id (offline and not in the HF "
            "cache?). Download it on a connected machine with "
            f"`huggingface-cli download {model_dir_or_repo}` and point "
            "from_pretrained at the local path."
        ) from e


def from_pretrained(
    model_dir: str | Path,
    embedding_ckpt: Optional[str | Path] = None,
    rttm_out_dir: Optional[str | Path] = None,
    mesh=None,
    inference_overrides: Optional[dict] = None,
    clustering_overrides: Optional[dict] = None,
) -> DiarizationPipeline:
    """Build the full diarization pipeline from a local pretrained dir or an
    HF hub repo id. The override dicts layer on top of the model dir's
    `[inference.args]` / `[clustering.args]` TOML sections (the reference CLI
    exposes the same knobs, diarizen/pipelines/inference.py:222-320)."""
    model_dir = resolve_model_dir(model_dir)
    config = load_toml(model_dir / "config.toml")
    if inference_overrides:
        config.setdefault("inference", {}).setdefault("args", {}).update(
            {k: v for k, v in inference_overrides.items() if v is not None}
        )
    if clustering_overrides:
        config.setdefault("clustering", {}).setdefault("args", {}).update(
            {k: v for k, v in clustering_overrides.items() if v is not None}
        )

    # released snapshots carry training-time wavlm_src paths that don't
    # resolve locally; the snapshot checkpoint supplies the weights anyway,
    # so the builder may fall back to the preset architecture (inference
    # loading only — training entry points keep the loud failure)
    cfg, params, state = instantiate_model_for_inference(
        config["model"]["path"], config["model"].get("args", {})
    )
    ckpt_bin = model_dir / "pytorch_model.bin"
    ckpt_npz = model_dir / "params.npz"
    if ckpt_bin.exists():
        from diarizen_tpu.models.convert import load_eend_checkpoint

        params, state = load_eend_checkpoint(str(ckpt_bin), cfg)
    elif ckpt_npz.exists():
        from diarizen_tpu.train.checkpoint import load_pytree

        params = load_pytree(ckpt_npz)

    inference_args = config.get("inference", {}).get("args", {})
    seg_duration = float(inference_args.get("seg_duration", 8))
    batch_size = inference_args.get("batch_size", 32)
    seg_inf = SlidingInference(
        params, state, cfg, duration=seg_duration,
        step=inference_args.get("segmentation_step", 0.1) * seg_duration,
        batch_size=batch_size, mesh=mesh,
    )

    rcfg = ResNetConfig()
    if embedding_ckpt is not None:
        import torch

        sd = torch.load(embedding_ckpt, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        rparams = resnet_params_from_torch(sd, rcfg)
    else:
        rparams = jax.jit(lambda k: init_resnet_params(k, rcfg))(jax.random.PRNGKey(0))
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=batch_size, mesh=mesh,
    )

    cl = config.get("clustering", {}).get("args", {})
    method = cl.get("method", "AgglomerativeClustering")
    if method in ("AHC", "AgglomerativeClustering"):
        clustering = AgglomerativeClustering(
            threshold=cl.get("ahc_threshold", 0.70),
            min_cluster_size=cl.get("min_cluster_size", 30),
        )
    else:
        clustering = VBxClustering(
            plda_dir=str(model_dir / "plda"),
            ahc_criterion=cl.get("ahc_criterion", "distance"),
            ahc_threshold=cl.get("ahc_threshold", 0.6),
            fa=cl.get("Fa", 0.07), fb=cl.get("Fb", 0.8),
            lda_dim=cl.get("lda_dim", 128), max_iters=cl.get("max_iters", 20),
        )

    pipeline = DiarizationPipeline(
        seg_inference=seg_inf,
        emb_inference=emb_inf,
        clustering=clustering,
        eend_cfg=cfg,
        min_speakers=cl.get("min_speakers", 1),
        max_speakers=cl.get("max_speakers", 8),
        apply_median_filtering=inference_args.get("apply_median_filtering", True),
    )
    pipeline.rttm_out_dir = Path(rttm_out_dir) if rttm_out_dir else None
    return pipeline


def diarize_file(pipeline: DiarizationPipeline, wav_path: str | Path,
                 uri: Optional[str] = None):
    """Convenience: wav path -> Annotation (+ RTTM file when the pipeline has
    an rttm_out_dir, reference inference.py:186-192)."""
    uri = uri or Path(wav_path).stem
    wave, sr = read_audio(wav_path)
    ann = pipeline(wave, sr, uri=uri)
    out_dir = getattr(pipeline, "rttm_out_dir", None)
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)
        (out_dir / f"{uri}.rttm").write_text(ann.to_rttm())
    return ann


def main(argv=None):
    """wav.scp-driven CLI (reference DiariZenPipeline __main__,
    diarizen/pipelines/inference.py:195-368): one RTTM per recording.
    Files are processed through `DiarizationPipeline.stream` so each file's
    device work overlaps the previous file's host stages."""
    import argparse

    from diarizen_tpu.core.io_rttm import load_scp

    ap = argparse.ArgumentParser(
        "python -m diarizen_tpu.pipelines",
        description="Diarize a wav.scp with a pretrained DiariZen-style model",
    )
    ap.add_argument("--in_wav_scp", required=True, help="rec-id -> wav path")
    ap.add_argument("--model_dir", required=True,
                    help="local model dir or HF hub repo id (config.toml + ckpt)")
    ap.add_argument("--embedding_model", default=None,
                    help="WeSpeaker ResNet34 checkpoint (torch .bin)")
    ap.add_argument("--rttm_out_dir", required=True)
    # inference overrides
    ap.add_argument("--seg_duration", type=float, default=None)
    ap.add_argument("--segmentation_step", type=float, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--apply_median_filtering",
                    action=argparse.BooleanOptionalAction, default=None)
    # clustering overrides
    ap.add_argument("--clustering_method", default=None,
                    choices=["VBxClustering", "AgglomerativeClustering"])
    ap.add_argument("--min_speakers", type=int, default=None)
    ap.add_argument("--max_speakers", type=int, default=None)
    ap.add_argument("--ahc_criterion", default=None)
    ap.add_argument("--ahc_threshold", type=float, default=None)
    ap.add_argument("--min_cluster_size", type=int, default=None)
    ap.add_argument("--Fa", type=float, default=None)
    ap.add_argument("--Fb", type=float, default=None)
    ap.add_argument("--lda_dim", type=int, default=None)
    args = ap.parse_args(argv)

    pipeline = from_pretrained(
        args.model_dir,
        embedding_ckpt=args.embedding_model,
        rttm_out_dir=args.rttm_out_dir,
        inference_overrides=dict(
            seg_duration=args.seg_duration,
            segmentation_step=args.segmentation_step,
            batch_size=args.batch_size,
            apply_median_filtering=args.apply_median_filtering,
        ),
        clustering_overrides=dict(
            method=args.clustering_method,
            min_speakers=args.min_speakers,
            max_speakers=args.max_speakers,
            ahc_criterion=args.ahc_criterion,
            ahc_threshold=args.ahc_threshold,
            min_cluster_size=args.min_cluster_size,
            Fa=args.Fa, Fb=args.Fb, lda_dim=args.lda_dim,
        ),
    )
    scp = load_scp(args.in_wav_scp)
    out_dir = Path(args.rttm_out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    def waves():
        for uri, path in scp.items():
            wave, sr = read_audio(path)
            assert sr == pipeline.seg_inference.sample_rate, (
                f"{path}: resample {sr} -> {pipeline.seg_inference.sample_rate}"
            )
            yield wave

    for uri, ann in zip(scp, pipeline.stream(waves(), uris=list(scp))):
        (out_dir / f"{uri}.rttm").write_text(ann.to_rttm())
        print(f"{uri}: {len(ann.labels())} speakers", flush=True)


if __name__ == "__main__":
    main()
