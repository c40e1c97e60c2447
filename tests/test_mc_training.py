"""Multi-channel training path: MC train step (random channel truncation),
gradient parity flash-vs-XLA through the MC forward, and the MC recipe CLI
end-to-end (VERDICT round-1 Missing #1)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.mc import (
    FusionConfig,
    McEendConfig,
    eend_mc_forward,
    init_eend_mc_params,
)
from diarizen_tpu.models.wavlm import WavLMConfig, set_flash_attention
from diarizen_tpu.train.loss import segmentation_loss
from diarizen_tpu.train.step import (
    create_train_state,
    make_mc_eval_step,
    make_mc_train_step,
)

REPO = Path(__file__).resolve().parents[1]


def tiny_mc_cfg(chunk_size=0.125, num_channels=3, dropout=0.0):
    n = 2
    wavlm = WavLMConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        embed_dim=64, num_layers=n,
        use_attention=(True,) * n, use_feed_forward=(True,) * n,
        total_num_heads=(4,) * n, remaining_heads=(tuple(range(4)),) * n,
        ff_interm_features=(128,) * n, num_buckets=40, max_distance=100,
        layer_drop=0.0, dropout=dropout, attention_dropout=dropout,
        projection_dropout=dropout,
    )
    return McEendConfig(
        wavlm=wavlm,
        conformer=ConformerConfig(
            dim=32, ffn_hidden=64, num_heads=4, num_layers=1, dropout=dropout
        ),
        wavlm_layer_num=n + 1, wavlm_feat_dim=64, attention_in=32,
        chunk_size=float(chunk_size),
        fusion=FusionConfig(
            hidden=16, num_heads=4, num_fusion_layers=2, dropout=dropout
        ),
        num_channels=num_channels,
    )


def test_mc_train_step_loss_decreases():
    cfg = tiny_mc_cfg()
    params, state = init_eend_mc_params(
        jax.random.PRNGKey(0), cfg, cfg.fusion
    )
    optimizer = optax.adam(3e-3)
    train_state = create_train_state(params, state, optimizer)
    step = jax.jit(
        make_mc_train_step(cfg, optimizer, compute_dtype=jnp.float32),
        static_argnums=(3,), donate_argnums=(0,),
    )

    rng = jax.random.PRNGKey(1)
    b, c, t = 4, 3, 2000
    f = cfg.num_frames(t)
    xs = np.asarray(jax.random.normal(rng, (b, c, t))) * 0.1
    target = np.zeros((b, f, cfg.max_speakers_per_chunk), np.float32)
    target[:, : f // 2, 0] = 1.0
    target[:, f // 2 :, 1] = 1.0
    batch = {"xs": jnp.asarray(xs), "target": jnp.asarray(target)}

    losses = []
    channel_rng = np.random.default_rng(0)
    for i in range(12):
        k = int(channel_rng.integers(1, c + 1))  # random truncation per step
        train_state, metrics = step(train_state, batch, rng, k)
        losses.append(float(metrics["loss"]))
        assert not bool(metrics["skipped"])
    assert losses[-1] < losses[0], losses
    assert int(train_state.step) == 12

    # eval step runs on all channels and returns DER components
    eval_step = jax.jit(make_mc_eval_step(cfg, compute_dtype=jnp.float32))
    m = eval_step(train_state, batch)
    for key in ("false_alarm", "missed_detection", "confusion", "speech_total"):
        assert np.isfinite(float(m[key]))


def test_mc_grads_flash_vs_xla():
    """Full MC-model gradient parity: Pallas flash attention (interpret on
    CPU) vs the XLA attention path, dropout 0."""
    cfg = tiny_mc_cfg()
    params, state = init_eend_mc_params(jax.random.PRNGKey(0), cfg, cfg.fusion)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 2000)) * 0.1
    f = cfg.num_frames(2000)
    target = jnp.zeros((2, f, cfg.max_speakers_per_chunk))
    target = target.at[:, : f // 2, 0].set(1.0)
    powerset = cfg.powerset

    def loss(p, flag):
        set_flash_attention(flag)
        try:
            scores, _att, _ = eend_mc_forward(
                p, state, cfg, cfg.fusion, wave, train=True, rng=None,
            )
            return segmentation_loss(powerset, scores, target)
        finally:
            set_flash_attention(None)

    g_xla = jax.grad(lambda p: loss(p, False))(params)
    g_flash = jax.grad(lambda p: loss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla), jax.tree_util.tree_leaves(g_flash)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# recipe CLI end-to-end

TINY_MC_BUILDER = '''
"""Tiny MC model builder importable by the config system."""
import jax
from diarizen_tpu.models.conformer import ConformerConfig
from diarizen_tpu.models.mc import (
    FusionConfig, McEendConfig, init_eend_mc_params,
)
from diarizen_tpu.models.wavlm import WavLMConfig


def tiny_mc(chunk_size=2.0, num_channels=2, seed=0, **kwargs):
    n = 2
    wavlm = WavLMConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        embed_dim=64, num_layers=n,
        use_attention=(True,) * n, use_feed_forward=(True,) * n,
        total_num_heads=(4,) * n, remaining_heads=(tuple(range(4)),) * n,
        ff_interm_features=(128,) * n, num_buckets=40, max_distance=100,
        layer_drop=0.0, dropout=0.0, attention_dropout=0.0, projection_dropout=0.0,
    )
    cfg = McEendConfig(
        wavlm=wavlm,
        conformer=ConformerConfig(dim=32, ffn_hidden=64, num_heads=4,
                                  num_layers=1, dropout=0.0),
        wavlm_layer_num=n + 1, wavlm_feat_dim=64, attention_in=32,
        chunk_size=float(chunk_size),
        fusion=FusionConfig(hidden=16, num_heads=4, num_fusion_layers=2,
                            dropout=0.0),
        num_channels=num_channels,
    )
    params, state = init_eend_mc_params(jax.random.PRNGKey(seed), cfg, cfg.fusion)
    return cfg, params, state
'''


@pytest.fixture(scope="module")
def mc_workdir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mc_recipe")
    sr = 16000
    from diarizen_tpu.core.audio import write_wav

    rng = np.random.default_rng(7)
    for split in ["train", "dev"]:
        d = tmp / "data" / split
        d.mkdir(parents=True)
        scp, rttm, uem = [], [], []
        for rec in ["a", "b"]:
            t = np.arange(14 * sr) / sr
            wave = np.zeros((2, len(t)), dtype=np.float32)  # 2 channels
            for spk, (s, e), f in [("A", (1.0, 7.0), 220), ("B", (6.0, 12.0), 430)]:
                m = (t >= s) & (t < e)
                sig = 0.2 * np.sin(2 * np.pi * f * t[m]).astype(np.float32)
                wave[0, m] += sig
                wave[1, m] += 0.7 * sig  # attenuated second mic
            wave += 0.01 * rng.standard_normal(wave.shape).astype(np.float32)
            p = d / f"{split}_{rec}.wav"
            write_wav(p, wave, sr)
            scp.append(f"{split}_{rec} {p}")
            uem.append(f"{split}_{rec} 1 0.0 14.0")
            rttm.append(f"SPEAKER {split}_{rec} 1 1.00 6.00 <NA> <NA> A <NA> <NA>")
            rttm.append(f"SPEAKER {split}_{rec} 1 6.00 6.00 <NA> <NA> B <NA> <NA>")
        (d / "wav.scp").write_text("\n".join(scp) + "\n")
        (d / "rttm").write_text("\n".join(rttm) + "\n")
        (d / "all.uem").write_text("\n".join(uem) + "\n")

    (tmp / "tiny_model_mc.py").write_text(TINY_MC_BUILDER)

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
compute_dtype = "float32"

[optimizer_small]
path = "optax.adamw"
[optimizer_small.args]
lr = 1e-4

[optimizer_big]
path = "optax.adamw"
[optimizer_big.args]
lr = 3e-3

[model]
path = "tiny_model_mc.tiny_mc"
[model.args]
chunk_size = 2
num_channels = 2

[train_dataset]
path = "diarizen_tpu.train.dataset.DiarizationDataset"
[train_dataset.args]
scp_file = "{tmp}/data/train/wav.scp"
rttm_file = "{tmp}/data/train/rttm"
uem_file = "{tmp}/data/train/all.uem"
chunk_size = 2
chunk_shift = 1
num_channels = 2
channel_mode = "multichannel"

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
num_channels = 2
channel_mode = "multichannel"

[validate_dataset.dataloader]
batch_size = 4
"""
    (tmp / "tiny_mc.toml").write_text(config)
    return tmp


def _run(cmd, cwd, timeout=480):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{cwd}"
    env["DIARIZEN_PLATFORM"] = "cpu"
    result = subprocess.run(
        [sys.executable] + cmd, cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    if result.returncode != 0:
        raise AssertionError(
            f"cmd failed: {cmd}\nstdout:\n{result.stdout[-3000:]}\nstderr:\n{result.stderr[-3000:]}"
        )
    return result


def test_mc_recipe_train_cli(mc_workdir):
    """MC model trains 2 epochs with decreasing loss through the CLI."""
    _run([str(REPO / "recipes/diar_ssl_mc/run.py"),
          "-C", str(mc_workdir / "tiny_mc.toml"), "-M", "train"], cwd=mc_workdir)
    exp = mc_workdir / "exp" / "tiny_mc"
    metrics = [json.loads(l) for l in (exp / "metrics.jsonl").read_text().splitlines()]
    assert len(metrics) == 2
    assert metrics[1]["loss"] <= metrics[0]["loss"], metrics
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert (exp / "checkpoints" / "epoch_0001" / "params.npz").exists()
