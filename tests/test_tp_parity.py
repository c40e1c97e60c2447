"""Tensor-parallel correctness (not just liveness).

VERDICT r1: the only TP gate was `isfinite(loss)`; a sharding-spec bug that
silently mangled numerics would have passed. These tests pin:
  * the exact set of leaves `eend_param_shardings` shards (golden list — the
    path heuristic in parallel/mesh.py:51-79 cannot silently regress);
  * forward parity: model-sharded WavLM forward == replicated (f32, 1e-5);
  * one full train step on a (data=2, model=2) mesh == the unsharded step
    (loss, grad-norm, and updated params).

Runs on the virtual 8-device CPU mesh from conftest.py.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from diarizen_tpu.models.eend import (
    eend_forward,
    init_eend_params,
    non_wavlm_param_labels,
)
from diarizen_tpu.parallel.mesh import eend_param_shardings, make_mesh
from diarizen_tpu.train.optim import dual_lr_optimizer
from diarizen_tpu.train.step import create_train_state, make_train_step

sys.path.insert(0, os.path.dirname(__file__))
from test_pipeline import tiny_eend_cfg  # noqa: E402


GOLDEN_SHARDED_LEAVES = {
    # Megatron split: q/k/v + gate projection column-sharded (bias follows),
    # out-proj and FF-out row-sharded (bias replicated, added post-reduce).
    "['attn']['q']['w']": P(None, "model"),
    "['attn']['q']['b']": P("model"),
    "['attn']['k']['w']": P(None, "model"),
    "['attn']['k']['b']": P("model"),
    "['attn']['v']['w']": P(None, "model"),
    "['attn']['v']['b']": P("model"),
    "['attn']['gru_linear']['w']": P(None, "model"),
    "['attn']['gru_linear']['b']": P("model"),
    "['attn']['out']['w']": P("model", None),
    "['ff']['in']['w']": P(None, "model"),
    "['ff']['in']['b']": P("model"),
    "['ff']['out']['w']": P("model", None),
}


def test_eend_param_shardings_golden_leaves():
    """Every WavLM transformer layer must shard EXACTLY the golden leaf set
    over 'model'; everything else (conv FE, pos-conv, norms, conformer,
    classifier) stays replicated."""
    cfg = tiny_eend_cfg()
    params, _ = init_eend_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = eend_param_shardings(params, mesh)

    actual = {
        jax.tree_util.keystr(path): s.spec
        for path, s in jax.tree_util.tree_leaves_with_path(shardings)
        if s.spec != P()
    }
    num_layers = cfg.wavlm.num_layers
    expected = {}
    for i in range(num_layers):
        for suffix, spec in GOLDEN_SHARDED_LEAVES.items():
            expected[f"['wavlm']['layers'][{i}]{suffix}"] = spec
    assert actual == expected


def test_grouped_conv_grad_spmd():
    """Pins the XLA bug that forced conv1d's grouped-conv formulations
    (models/common.py): on jax 0.9.0, `feature_group_count` conv weight
    gradients come back multiplied by the idle-mesh-axis size when the input
    is batch-sharded on a 2-D mesh. Our depthwise (shift-multiply) and
    grouped (per-group dense) paths must produce correct gradients there."""
    from diarizen_tpu.models.common import conv1d

    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 64, 16)).astype(np.float32)

    for groups, w_shape in [(16, (5, 1, 16)), (4, (5, 4, 16))]:
        w = rng.standard_normal(w_shape).astype(np.float32)

        def loss(w, x):
            return jnp.mean(conv1d({"w": w}, x, padding=2, groups=groups) ** 2)

        # forward parity vs raw XLA grouped conv (single device)
        y_ref = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(2, 2)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups,
        )
        y = conv1d({"w": jnp.asarray(w)}, jnp.asarray(x), padding=2, groups=groups)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)

        g_ref = np.asarray(jax.jit(jax.grad(loss))(w, x))
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        ws = jax.device_put(w, NamedSharding(mesh, P()))
        g = np.asarray(jax.jit(jax.grad(loss))(ws, xs))
        np.testing.assert_allclose(g, g_ref, atol=1e-5, rtol=1e-4)


def _make_batch(cfg, batch_size=4, seed=1):
    num_samples = int(cfg.chunk_size * cfg.sample_rate)
    num_frames = cfg.num_frames(num_samples)
    rng = np.random.default_rng(seed)
    return {
        "xs": (rng.standard_normal((batch_size, 1, num_samples)) * 0.1).astype(
            np.float32
        ),
        "target": (
            rng.uniform(size=(batch_size, num_frames, cfg.max_speakers_per_chunk))
            > 0.7
        ).astype(np.float32),
    }


def test_tp_forward_matches_replicated():
    cfg = tiny_eend_cfg()
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)
    batch = _make_batch(cfg)

    ref, _ = jax.jit(
        lambda p, s, x: eend_forward(p, s, cfg, x, train=False,
                                     compute_dtype=jnp.float32)
    )(params, state, batch["xs"])

    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    p_sharded = jax.device_put(params, eend_param_shardings(params, mesh))
    s_repl = jax.device_put(state, NamedSharding(mesh, P()))
    x_sharded = jax.device_put(batch["xs"], NamedSharding(mesh, P("data")))
    out, _ = jax.jit(
        lambda p, s, x: eend_forward(p, s, cfg, x, train=False,
                                     compute_dtype=jnp.float32)
    )(p_sharded, s_repl, x_sharded)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _assert_trees_close(got, ref, atol, rtol):
    flat_got = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(got)
    )
    for path, ref_leaf in jax.tree_util.tree_leaves_with_path(ref):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            flat_got[key], ref_leaf, atol=atol, rtol=rtol, err_msg=key
        )


@pytest.mark.parametrize("n_data,n_model", [(2, 2), (1, 2)])
def test_tp_gradients_match_replicated(n_data, n_model):
    """Per-leaf GRADIENTS of the PIT loss under (data, model) sharding must
    equal the replicated gradients. (Gradients — not post-AdamW params: at
    step 1 Adam maps any grad to ~±lr, so reduction-order noise on near-zero
    grads flips update signs; grads are the real sharding-correctness
    signal.)"""
    from diarizen_tpu.train.loss import segmentation_loss

    cfg = tiny_eend_cfg()
    powerset = cfg.powerset
    batch = _make_batch(cfg)
    params, state = init_eend_params(jax.random.PRNGKey(0), cfg)

    def loss_fn(p, xs, target):
        scores, _ = eend_forward(
            p, state, cfg, xs, train=False, compute_dtype=jnp.float32
        )
        return segmentation_loss(powerset, scores, target)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
        params, batch["xs"], batch["target"]
    )
    ref_grads = jax.device_get(ref_grads)

    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[: n_data * n_model])
    p_sharded = jax.device_put(params, eend_param_shardings(params, mesh))
    b_sharded = jax.device_put(batch, NamedSharding(mesh, P("data")))
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
        p_sharded, b_sharded["xs"], b_sharded["target"]
    )

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    _assert_trees_close(jax.device_get(grads), ref_grads, atol=1e-5, rtol=1e-3)


@pytest.mark.parametrize("n_data,n_model", [(2, 2), (1, 2)])
def test_tp_train_step_matches_replicated(n_data, n_model):
    """One full train step sharded over (data, model) must equal the
    unsharded step: params bit-close under SGD (no Adam normalization
    amplifying reduction-order noise), and loss/grad-norm parity for the
    production dual-LR AdamW + auto-clip path."""
    import optax

    cfg = tiny_eend_cfg()
    batch = _make_batch(cfg)
    rng = jax.random.PRNGKey(3)
    mesh = make_mesh(n_data=n_data, n_model=n_model,
                     devices=jax.devices()[: n_data * n_model])
    repl = NamedSharding(mesh, P())

    def run(optimizer, sharded):
        params, model_state = init_eend_params(jax.random.PRNGKey(0), cfg)
        state = create_train_state(params, model_state, optimizer)
        b = batch
        if sharded:
            state = state._replace(
                params=jax.device_put(
                    state.params, eend_param_shardings(state.params, mesh)
                ),
                model_state=jax.device_put(state.model_state, repl),
                opt_state=jax.device_put(state.opt_state, repl),
                step=jax.device_put(state.step, repl),
            )
            b = jax.device_put(batch, NamedSharding(mesh, P("data")))
        step = jax.jit(make_train_step(cfg, optimizer, compute_dtype=jnp.float32))
        new_state, metrics = step(state, b, rng)
        return jax.device_get(new_state.params), jax.device_get(metrics)

    # SGD: linear in the gradient -> sharded params must match tightly
    ref_p, ref_m = run(optax.sgd(1e-2), sharded=False)
    got_p, got_m = run(optax.sgd(1e-2), sharded=True)
    np.testing.assert_allclose(got_m["loss"], ref_m["loss"], rtol=1e-5)
    _assert_trees_close(got_p, ref_p, atol=1e-7, rtol=1e-5)

    # production optimizer: loss + grad-norm parity
    params0, _ = init_eend_params(jax.random.PRNGKey(0), cfg)
    make_opt = lambda: dual_lr_optimizer(
        non_wavlm_param_labels(params0), lr_small=1e-4, lr_big=3e-3,
        clip_percentile=90,
    )
    ref_p, ref_m = run(make_opt(), sharded=False)
    got_p, got_m = run(make_opt(), sharded=True)
    np.testing.assert_allclose(got_m["loss"], ref_m["loss"], rtol=1e-5)
    np.testing.assert_allclose(got_m["grad_norm"], ref_m["grad_norm"], rtol=1e-3)
