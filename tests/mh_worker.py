"""Multi-host execution worker: one OS process of an N-process jax run.

Invoked by tests/test_multihost.py as a subprocess. Forces the CPU platform
with 4 local virtual devices + gloo cross-process collectives, initializes
`jax.distributed` against a localhost coordinator, then runs:
  1. the full DiarizationPipeline (host path) — its embedding stage fans the
     windows out across processes (process_window_shard ->
     gather_window_shards -> clustering -> broadcast_from_host: the
     `process_count > 1` branches of parallel/distributed.py execute here)
  2. one DP train step over the GLOBAL (nproc x 4)-device mesh
and writes the RTTM + step metrics to --out for cross-process comparison.

Replaces the reference's `accelerate launch --num_processes N` flow
(recipes/diar_ssl/run_stage.sh:49-56, diarizen/utils.py:68-76).
"""

import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# must precede any jax import: the environment presets JAX_PLATFORMS=axon
# (the single-tenant real-TPU tunnel — an N-process test must NEVER open it)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def tiny_cfg():
    from diarizen_tpu.models.conformer import ConformerConfig
    from diarizen_tpu.models.eend import EendConfig
    from diarizen_tpu.models.wavlm import WavLMConfig

    n = 2
    wavlm = WavLMConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        embed_dim=64,
        num_layers=n,
        use_attention=(True,) * n,
        use_feed_forward=(True,) * n,
        total_num_heads=(4,) * n,
        remaining_heads=(tuple(range(4)),) * n,
        ff_interm_features=(128,) * n,
        num_buckets=40,
        max_distance=100,
        layer_drop=0.0,
        dropout=0.0,
        attention_dropout=0.0,
        projection_dropout=0.0,
    )
    return EendConfig(
        wavlm=wavlm,
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4,
                                  num_layers=1, dropout=0.0),
        wavlm_layer_num=n + 1,
        wavlm_feat_dim=64,
        attention_in=32,
        chunk_size=2.0,
    )


def make_wave(dur_s=6.5, sr=16000):
    t = np.arange(int(dur_s * sr)) / sr
    rng = np.random.default_rng(0)
    wave = 0.25 * np.sin(2 * np.pi * 220 * t)
    wave[len(t) // 2 :] = 0.25 * np.sin(2 * np.pi * 420 * t[len(t) // 2 :])
    wave += 0.02 * rng.standard_normal(t.shape)
    wave = np.clip(np.rint(wave * 32767.0), -32768, 32767) / 32768.0
    return wave[None].astype(np.float32)


def run_pipeline(cfg):
    from diarizen_tpu.cluster import AgglomerativeClustering
    from diarizen_tpu.infer.pipeline import DiarizationPipeline, EmbeddingInference
    from diarizen_tpu.infer.sliding import SlidingInference
    from diarizen_tpu.models.eend import init_eend_params
    from diarizen_tpu.models.resnet import ResNetConfig, init_resnet_params

    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    seg_inf = SlidingInference(params, state, cfg, batch_size=8,
                               compute_dtype=jnp.float32)
    rcfg = ResNetConfig(m_channels=8, num_blocks=(1, 1, 1, 1), embed_dim=32)
    rparams = init_resnet_params(jax.random.PRNGKey(1), rcfg)
    emb_inf = EmbeddingInference(
        rparams, rcfg, window_size=seg_inf.window_size,
        num_speakers=cfg.max_speakers_per_chunk, batch_size=8,
        compute_dtype=None,
    )
    pipeline = DiarizationPipeline(
        seg_inference=seg_inf, emb_inference=emb_inf,
        clustering=AgglomerativeClustering(threshold=0.7, min_cluster_size=2),
        eend_cfg=cfg, max_speakers=4,
    )
    ann = pipeline(make_wave(), 16000, uri="mh")
    return ann.to_rttm()


def run_train_step(cfg):
    from diarizen_tpu.models.eend import init_eend_params, non_wavlm_param_labels
    from diarizen_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from diarizen_tpu.train.optim import dual_lr_optimizer
    from diarizen_tpu.train.step import create_train_state, make_train_step

    mesh = make_mesh()  # all (nproc * 4) global devices on the data axis
    params, model_state = init_eend_params(jax.random.PRNGKey(0), cfg)
    optimizer = dual_lr_optimizer(
        non_wavlm_param_labels(params), lr_small=1e-4, lr_big=3e-3,
        clip_percentile=None,
    )
    state = create_train_state(params, model_state, optimizer)
    state = jax.device_put(state, replicated(mesh))

    nf = cfg.num_frames(int(cfg.chunk_size * 16000))
    rng = np.random.default_rng(3)
    batch = {
        "xs": (rng.standard_normal((8, 1, int(cfg.chunk_size * 16000)))
               .astype(np.float32) * 0.1),
        "target": (rng.uniform(size=(8, nf, 4)) < 0.3).astype(np.float32),
    }
    step_fn = jax.jit(make_train_step(cfg, optimizer, compute_dtype=jnp.float32))
    state, metrics = step_fn(state, shard_batch(batch, mesh), jax.random.PRNGKey(7))
    return {k: float(v) for k, v in jax.device_get(metrics).items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from diarizen_tpu.parallel.distributed import initialize_distributed

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nproc,
        process_id=args.pid,
    )
    assert jax.process_count() == args.nproc, jax.process_count()
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 4 * args.nproc

    cfg = tiny_cfg()
    rttm = run_pipeline(cfg)
    metrics = run_train_step(cfg)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / f"rttm_{args.pid}.txt").write_text(rttm)
    (out / f"metrics_{args.pid}.json").write_text(json.dumps(metrics))
    print(f"worker {args.pid}/{args.nproc}: OK", flush=True)


if __name__ == "__main__":
    main()
