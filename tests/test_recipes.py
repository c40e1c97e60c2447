"""End-to-end recipe test: train 2 epochs from a TOML config via run.py, then
checkpoint-averaged inference + DER scoring via infer.py — both through their
CLI entry points (subprocess), on synthetic data."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

TINY_MODEL_BUILDER = '''
"""Tiny test model builder importable by the config system."""
import jax
from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.eend import EendConfig, init_eend_params
from diarizen_tpu.models.wavlm import WavLMConfig


def tiny_wavlm_conformer(chunk_size=2.0, seed=0, **kwargs):
    n = 2
    wavlm = WavLMConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        embed_dim=64, num_layers=n,
        use_attention=(True,) * n, use_feed_forward=(True,) * n,
        total_num_heads=(4,) * n, remaining_heads=(tuple(range(4)),) * n,
        ff_interm_features=(128,) * n, num_buckets=40, max_distance=100,
        layer_drop=0.0, dropout=0.0, attention_dropout=0.0, projection_dropout=0.0,
    )
    cfg = EendConfig(
        wavlm=wavlm,
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4, num_layers=1, dropout=0.0),
        wavlm_layer_num=n + 1, wavlm_feat_dim=64, attention_in=32,
        chunk_size=float(chunk_size),
    )
    params, state = init_eend_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params, state
'''


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("recipe")
    sr = 16000
    from diarizen_tpu.core.audio import write_wav

    for split in ["train", "dev"]:
        d = tmp / "data" / split
        d.mkdir(parents=True)
        scp, rttm, uem = [], [], []
        for rec in ["a", "b"]:
            t = np.arange(14 * sr) / sr
            wave = np.zeros_like(t, dtype=np.float32)
            for spk, (s, e), f in [("A", (1.0, 7.0), 220), ("B", (6.0, 12.0), 430)]:
                m = (t >= s) & (t < e)
                wave[m] += 0.2 * np.sin(2 * np.pi * f * t[m]).astype(np.float32)
            p = d / f"{split}_{rec}.wav"
            write_wav(p, wave[None], sr)
            scp.append(f"{split}_{rec} {p}")
            uem.append(f"{split}_{rec} 1 0.0 14.0")
            rttm.append(f"SPEAKER {split}_{rec} 1 1.00 6.00 <NA> <NA> A <NA> <NA>")
            rttm.append(f"SPEAKER {split}_{rec} 1 6.00 6.00 <NA> <NA> B <NA> <NA>")
        (d / "wav.scp").write_text("\n".join(scp) + "\n")
        (d / "rttm").write_text("\n".join(rttm) + "\n")
        (d / "all.uem").write_text("\n".join(uem) + "\n")

    (tmp / "tiny_model.py").write_text(TINY_MODEL_BUILDER)

    config = f"""
[meta]
save_dir = "{tmp}/exp"
seed = 3407

[trainer]
path = "diarizen_tpu.train.trainer.Trainer"
[trainer.args]
max_epochs = 2
max_patience = 5
gradient_percentile = 90

[optimizer_small]
path = "optax.adamw"
[optimizer_small.args]
lr = 1e-4

[optimizer_big]
path = "optax.adamw"
[optimizer_big.args]
lr = 3e-3

[model]
path = "tiny_model.tiny_wavlm_conformer"
[model.args]
chunk_size = 2

[inference]
[inference.args]
seg_duration = 2
batch_size = 8
apply_median_filtering = true

[clustering]
[clustering.args]
method = "AgglomerativeClustering"
ahc_threshold = 0.70
min_cluster_size = 3
min_speakers = 1
max_speakers = 4

[train_dataset]
path = "diarizen_tpu.train.dataset.DiarizationDataset"
[train_dataset.args]
scp_file = "{tmp}/data/train/wav.scp"
rttm_file = "{tmp}/data/train/rttm"
uem_file = "{tmp}/data/train/all.uem"
chunk_size = 2
chunk_shift = 1

[train_dataset.dataloader]
batch_size = 4

[validate_dataset]
path = "diarizen_tpu.train.dataset.DiarizationDataset"
[validate_dataset.args]
scp_file = "{tmp}/data/dev/wav.scp"
rttm_file = "{tmp}/data/dev/rttm"
uem_file = "{tmp}/data/dev/all.uem"
chunk_size = 2
chunk_shift = 2

[validate_dataset.dataloader]
batch_size = 4
"""
    (tmp / "tiny.toml").write_text(config)
    return tmp


def _run(cmd, cwd, timeout=480):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{cwd}"
    env["DIARIZEN_PLATFORM"] = "cpu"
    # the axon sitecustomize overrides JAX_PLATFORMS at interpreter start;
    # neutralize by pointing jax at cpu through the config env hook too
    result = subprocess.run(
        [sys.executable] + cmd, cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    if result.returncode != 0:
        raise AssertionError(
            f"cmd failed: {cmd}\nstdout:\n{result.stdout[-3000:]}\nstderr:\n{result.stderr[-3000:]}"
        )
    return result


def test_recipe_train_and_infer(workdir):
    _run([str(REPO / "recipes/diar_ssl/run.py"), "-C", str(workdir / "tiny.toml"),
          "-M", "train"], cwd=workdir)
    exp = workdir / "exp" / "tiny"
    metrics = [json.loads(l) for l in (exp / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 2
    assert (exp / "checkpoints" / "epoch_0001" / "params.npz").exists()
    assert (exp / "config.toml").exists()

    out = workdir / "infer_out"
    _run([
        str(REPO / "recipes/diar_ssl/infer.py"),
        "-C", str(workdir / "tiny.toml"),
        "--exp_dir", str(exp),
        "--wav_scp", str(workdir / "data/dev/wav.scp"),
        "--ref_rttm", str(workdir / "data/dev/rttm"),
        "--out_dir", str(out),
        "--avg_ckpt_num", "2",
    ], cwd=workdir)
    assert (out / "dev_a.rttm").exists()
    der = json.loads((out / "der.json").read_text())
    assert "der" in der and np.isfinite(der["der"])
    # 2 epochs on tones with random embeddings: no DER guarantee, just sanity
    assert der["der"] >= 0


def _variant_config(workdir, name, model_path, model_args, trainer_extra="",
                    single_opt=True):
    """Derive a 2-epoch single-opt config for another model family
    (the reference fbank/pyannote/frozen confs differ from the flagship conf
    only in [model]/[optimizer]/trainer flags)."""
    opt = (
        "[optimizer]\npath = \"optax.adamw\"\n[optimizer.args]\nlr = 1e-3\n"
        if single_opt else
        "[optimizer_small]\npath = \"optax.adamw\"\n[optimizer_small.args]\nlr = 1e-4\n"
        "[optimizer_big]\npath = \"optax.adamw\"\n[optimizer_big.args]\nlr = 3e-3\n"
    )
    args_lines = "\n".join(f"{k} = {v}" for k, v in model_args.items())
    config = f"""
[meta]
save_dir = "{workdir}/exp"
seed = 3407

[trainer]
path = "diarizen_tpu.train.trainer.Trainer"
[trainer.args]
max_epochs = 2
max_patience = 5
gradient_percentile = 90
{trainer_extra}

{opt}
[model]
path = "{model_path}"
[model.args]
{args_lines}

[train_dataset]
path = "diarizen_tpu.train.dataset.DiarizationDataset"
[train_dataset.args]
scp_file = "{workdir}/data/train/wav.scp"
rttm_file = "{workdir}/data/train/rttm"
uem_file = "{workdir}/data/train/all.uem"
chunk_size = 2
chunk_shift = 1

[train_dataset.dataloader]
batch_size = 4

[validate_dataset]
path = "diarizen_tpu.train.dataset.DiarizationDataset"
[validate_dataset.args]
scp_file = "{workdir}/data/dev/wav.scp"
rttm_file = "{workdir}/data/dev/rttm"
uem_file = "{workdir}/data/dev/all.uem"
chunk_size = 2
chunk_shift = 2

[validate_dataset.dataloader]
batch_size = 4
"""
    path = workdir / f"{name}.toml"
    path.write_text(config)
    return path


def test_recipe_frozen_wavlm(workdir):
    """Single-[optimizer] + freeze_wavlm=true (the reference
    wavlm_frozen_conformer recipe): trains, and the trunk params must be
    BIT-identical to init after 2 epochs."""
    conf = _variant_config(
        workdir, "frozen", "tiny_model.tiny_wavlm_conformer",
        {"chunk_size": 2}, trainer_extra="freeze_wavlm = true",
    )
    _run([str(REPO / "recipes/diar_ssl/run.py"), "-C", str(conf), "-M", "train"],
         cwd=workdir)
    exp = workdir / "exp" / "frozen"
    metrics = [json.loads(l) for l in (exp / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 2 and all(np.isfinite(m["train_loss"]) for m in metrics)

    import jax
    from diarizen_tpu.train.checkpoint import load_checkpoint

    sys.path.insert(0, str(workdir))
    try:
        import tiny_model

        _, params0, _ = tiny_model.tiny_wavlm_conformer(chunk_size=2, seed=3407)
    finally:
        sys.path.remove(str(workdir))
    trained, _, _, _ = load_checkpoint(exp / "checkpoints" / "epoch_0001")
    for path, leaf in jax.tree_util.tree_leaves_with_path(trained["wavlm"]):
        expected = params0["wavlm"]
        for k in path:
            expected = expected[getattr(k, "key", getattr(k, "idx", None))]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(expected))
    # the head must have moved
    assert not np.array_equal(
        np.asarray(trained["classifier"]["w"]), np.asarray(params0["classifier"]["w"])
    )


def test_recipe_fbank_conformer(workdir):
    """fbank_conformer family through the same runner (reference
    fbank_conformer.toml)."""
    conf = _variant_config(
        workdir, "fbank", "diarizen_tpu.models.build.fbank_conformer",
        {"attention_in": 32, "ffn_hidden": 64, "num_head": 4, "num_layer": 1,
         "dropout": 0.0, "chunk_size": 2},
    )
    _run([str(REPO / "recipes/diar_ssl/run.py"), "-C", str(conf), "-M", "train"],
         cwd=workdir)
    exp = workdir / "exp" / "fbank"
    metrics = [json.loads(l) for l in (exp / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 2 and all(np.isfinite(m["train_loss"]) for m in metrics)


def test_recipe_pyannote_baseline(workdir):
    """SincNet-BiLSTM family through the same runner (reference
    pyannote_baseline.toml)."""
    conf = _variant_config(
        workdir, "pyannote", "diarizen_tpu.models.build.pyannote_baseline",
        {"chunk_size": 2},
    )
    _run([str(REPO / "recipes/diar_ssl/run.py"), "-C", str(conf), "-M", "train"],
         cwd=workdir, timeout=900)
    exp = workdir / "exp" / "pyannote"
    metrics = [json.loads(l) for l in (exp / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 2 and all(np.isfinite(m["train_loss"]) for m in metrics)


def test_shipped_configs_parse_and_build():
    """Every shipped TOML must parse and its [model] section must build
    (tiny substitute sizes where the full trunk would be slow)."""
    from diarizen_tpu.config import load_toml

    confs = sorted((REPO / "recipes").glob("*/conf/*.toml"))
    assert len(confs) >= 7  # reference parity: diar_ssl x4 + mc x1 + pruning x2
    for conf in confs:
        config = load_toml(conf)
        assert "model" in config and "path" in config["model"], conf
        assert "train_dataset" in config, conf


def test_recipe_validate_mode(workdir):
    r = _run([str(REPO / "recipes/diar_ssl/run.py"), "-C", str(workdir / "tiny.toml"),
              "-M", "validate"], cwd=workdir)
    # resumes from the trained checkpoints and logs validation metrics
    assert "validate done" in (workdir / "exp" / "tiny" / "train.log").read_text()


def test_pruning_recipe_cli(workdir, tmp_path):
    """Distill-prune 2 epochs via CLI, then apply_pruning surgery via CLI."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    # synthesize a tiny reference-format WavLM checkpoint
    hf_cfg = transformers.WavLMConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, conv_dim=[24] * 7,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        num_buckets=40, max_bucket_distance=100,
        do_stable_layer_norm=False, feat_extract_norm="group",
        conv_bias=False, layerdrop=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.WavLMModel(hf_cfg)
    ref_dict = {
        "extractor_mode": "group_norm",
        "extractor_conv_layer_config": [[24, 10, 5]] + [[24, 3, 2]] * 4 + [[24, 2, 2]] * 2,
        "extractor_conv_bias": False,
        "encoder_embed_dim": 64,
        "encoder_pos_conv_kernel": 128,
        "encoder_pos_conv_groups": 16,
        "encoder_num_layers": 2,
        "encoder_total_num_heads": [4, 4],
        "encoder_remaining_heads": [[0, 1, 2, 3], [0, 1, 2, 3]],
        "encoder_num_buckets": 40,
        "encoder_max_distance": 100,
        "encoder_ff_interm_features": [128, 128],
        "encoder_layer_norm_first": False,
        "encoder_layer_drop": 0.0,
        "normalize_waveform": False,
        "encoder_dropout": 0.0,
        "encoder_attention_dropout": 0.0,
        "encoder_projection_dropout": 0.0,
    }
    ckpt_path = tmp_path / "tiny_wavlm.bin"
    torch.save({"config": ref_dict, "state_dict": hf_model.state_dict()}, ckpt_path)

    config = f"""
[meta]
save_dir = "{tmp_path}/exp"
seed = 3407

[trainer]
path = "diarizen_tpu.prune.distill"
[trainer.args]
max_epochs = 2
target_sparsity = 0.5
sparsity_warmup_epochs = 1
distill_layers = [0, 1, 2]
distill_lr = 1e-3
reg_lr = 2e-2

[model]
path = "diarizen_tpu.models.build.wavlm_conformer"
[model.args]
wavlm_src = "{ckpt_path}"

[train_dataset]
path = "diarizen_tpu.train.dataset.DiarizationDataset"
[train_dataset.args]
scp_file = "{workdir}/data/train/wav.scp"
rttm_file = "{workdir}/data/train/rttm"
uem_file = "{workdir}/data/train/all.uem"
chunk_size = 2
chunk_shift = 2

[train_dataset.dataloader]
batch_size = 4
"""
    (tmp_path / "prune.toml").write_text(config)

    _run([str(REPO / "recipes/diar_ssl_pruning/run_distill_prune.py"),
          "-C", str(tmp_path / "prune.toml")], cwd=tmp_path)
    exp = tmp_path / "exp" / "prune"
    metrics = [json.loads(l) for l in (exp / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 2
    assert all(np.isfinite(m["loss"]) for m in metrics)

    out = tmp_path / "pruned"
    _run([str(REPO / "recipes/diar_ssl_pruning/apply_pruning.py"),
          "-C", str(tmp_path / "prune.toml"), "--out_dir", str(out),
          "--avg_ckpt_num", "2"], cwd=tmp_path)
    report = json.loads((out / "report.json").read_text())
    assert report["pruned_params_M"] <= report["original_params_M"]
    assert (out / "params.npz").exists() and (out / "config.json").exists()


def test_stage_drivers_exist_for_all_recipes():
    """Every recipe ships an executable, syntactically valid run_stage.sh
    (the reference has one per recipe dir)."""
    import subprocess

    root = Path(__file__).resolve().parents[1] / "recipes"
    for recipe in ("diar_ssl", "diar_ssl_mc", "diar_ssl_pruning"):
        script = root / recipe / "run_stage.sh"
        assert script.exists(), f"{recipe} lacks run_stage.sh"
        assert os.access(script, os.X_OK), f"{script} not executable"
        subprocess.run(["bash", "-n", str(script)], check=True)


def test_stage_drivers_execute_no_stage():
    """Execute each run_stage.sh with stage=99 (every stage guard false):
    the whole top-level runs under `set -euo pipefail` — defaulting logic
    and variable expansions are exercised, undefined-var bugs surface."""
    root = Path(__file__).resolve().parents[1] / "recipes"
    for recipe in ("diar_ssl", "diar_ssl_mc", "diar_ssl_pruning"):
        script = root / recipe / "run_stage.sh"
        result = subprocess.run(
            ["bash", str(script), "99"], cwd=root / recipe,
            capture_output=True, text=True, timeout=60,
        )
        assert result.returncode == 0, f"{script}: {result.stderr[-2000:]}"


def test_stage_driver_full_run_diar_ssl(workdir, tmp_path):
    """run_stage.sh end-to-end with the tiny config: stage 1 (train) +
    stage 2/3 (checkpoint-averaged inference + DER report) through the
    actual shell driver, like the reference's run_stage.sh flow."""
    stage_dir = tmp_path / "recipe"
    stage_dir.mkdir()
    recipe = REPO / "recipes" / "diar_ssl"
    for f in ("run.py", "infer.py", "run_stage.sh"):
        (stage_dir / f).symlink_to(recipe / f)
    # test set laid out where the driver's relative paths expect it
    syn = stage_dir / "data" / "SYN" / "test"
    syn.mkdir(parents=True)
    for f in ("wav.scp", "rttm", "all.uem"):
        (syn / f).symlink_to(workdir / "data" / "dev" / f)

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{workdir}"
    env["DIARIZEN_PLATFORM"] = "cpu"
    env["CONF"] = str(workdir / "tiny.toml")
    # run.py derives the exp dir from the config's meta.save_dir + stem;
    # EXP_DIR must point THERE or stage 2 would select zero checkpoints
    # (now a loud error — it used to silently score random weights)
    env["EXP_DIR"] = str(workdir / "exp" / "tiny")
    env["TEST_SETS"] = "SYN"
    result = subprocess.run(
        ["bash", str(stage_dir / "run_stage.sh"), "1"], cwd=stage_dir,
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, (
        f"stdout:\n{result.stdout[-3000:]}\nstderr:\n{result.stderr[-3000:]}"
    )
    der = json.loads(
        (workdir / "exp" / "tiny" / "infer" / "SYN" / "der.json").read_text()
    )
    assert "der" in der and np.isfinite(der["der"])
