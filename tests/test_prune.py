"""Pruning/distillation tests: HardConcrete parity vs the reference torch
implementation, analytic param counter, Lagrangian distill-prune step
dynamics, and surgery equivalence (gated forward == pruned forward)."""

import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diarizen_tpu.models.wavlm import (
    WavLMConfig,
    init_wavlm_params,
    wavlm_extract_features,
)
from diarizen_tpu.prune import (
    DistillConfig,
    PruneConfig,
    apply_pruning,
    compile_gates,
    compiled_mask,
    count_params_pytree,
    create_distill_prune_state,
    expected_num_params,
    init_gates,
    init_log_alpha,
    l0_norm,
    make_distill_prune_optimizer,
    make_distill_prune_step,
    sample_mask,
)

torch = pytest.importorskip("torch")

REF_HC = "/root/reference/diarizen/models/module/wav2vec2/hardconcrete.py"
needs_reference = pytest.mark.skipif(not os.path.exists(REF_HC), reason="no reference")


def tiny_wavlm(n=2):
    return WavLMConfig(
        conv_layers=((16, 10, 5), (16, 3, 2), (16, 2, 2)),
        embed_dim=32,
        num_layers=n,
        use_attention=(True,) * n,
        use_feed_forward=(True,) * n,
        total_num_heads=(4,) * n,
        remaining_heads=(tuple(range(4)),) * n,
        ff_interm_features=(64,) * n,
        num_buckets=16,
        max_distance=20,
        layer_drop=0.0,
        dropout=0.0,
        attention_dropout=0.0,
        projection_dropout=0.0,
    )


@needs_reference
def test_hardconcrete_matches_reference():
    spec = importlib.util.spec_from_file_location("ref_hc", REF_HC)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    ref = mod.HardConcrete(n_in=64, init_mean=0.3)
    log_alpha = ref.log_alpha.detach().numpy().copy()

    # l0 norm parity
    np.testing.assert_allclose(
        float(l0_norm(jnp.asarray(log_alpha))), float(ref.l0_norm()), rtol=1e-5
    )
    # compiled (eval) mask parity
    ref.eval()
    with torch.no_grad():
        ref_mask = ref().numpy()
    np.testing.assert_allclose(compiled_mask(log_alpha), ref_mask, rtol=1e-5, atol=1e-6)

    # sampled mask statistics: mean close to expected alive fraction
    masks = np.stack(
        [np.asarray(sample_mask(jnp.asarray(log_alpha), jax.random.PRNGKey(i)))
         for i in range(200)]
    )
    assert masks.min() >= 0 and masks.max() <= 1
    # P(mask > 0) = sigmoid(log_alpha + bias) -> fraction alive == l0/n
    assert abs((masks > 0).mean() - float(ref.l0_norm()) / 64) < 0.05


def test_l0_gradient_flows():
    la = init_log_alpha(jax.random.PRNGKey(0), 16, init_mean=0.5)
    g = jax.grad(lambda x: l0_norm(x))(la)
    assert np.all(np.asarray(g) > 0)  # increasing log_alpha increases aliveness


def test_expected_num_params_matches_actual():
    cfg = tiny_wavlm()
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    actual = count_params_pytree(params)
    analytic = float(expected_num_params(cfg, {}))
    assert abs(analytic - actual) / actual < 0.02, (analytic, actual)


def test_distill_prune_step_dynamics():
    cfg = tiny_wavlm()
    teacher = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    student = jax.tree_util.tree_map(jnp.copy, teacher)
    pcfg = PruneConfig(prune_conv_channels=False)
    gates = init_gates(jax.random.PRNGKey(1), cfg, pcfg)
    dcfg = DistillConfig(
        target_sparsity=0.5, sparsity_warmup_updates=4, pre_train_updates=0,
        distill_lr=1e-3, reg_lr=5e-2, distill_layers=(0, 1, 2),
    )
    optimizer = make_distill_prune_optimizer(dcfg)
    state = create_distill_prune_state(student, gates, optimizer)
    step = jax.jit(
        make_distill_prune_step(cfg, dcfg, teacher, optimizer, compute_dtype=jnp.float32)
    )

    wave = jax.random.normal(jax.random.PRNGKey(2), (2, 2000)) * 0.1
    metrics_hist = []
    for i in range(8):
        state, metrics = step(state, wave, jax.random.PRNGKey(3))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})

    # sparsity target warms from ~0 to 0.5 over 4 updates
    assert metrics_hist[0]["sparsity_target"] < 0.2
    assert metrics_hist[5]["sparsity_target"] == pytest.approx(0.5)
    # lambdas must move (gradient ascent with negative lr)
    assert abs(metrics_hist[-1]["lambda1"]) > 0
    assert all(np.isfinite(m["loss"]) for m in metrics_hist)
    # identical teacher/student init at step 0 -> distill loss starts ~cos=-1
    assert metrics_hist[0]["loss_distill"] < -0.5


def test_surgery_matches_gated_forward():
    """Pruned model forward must equal the gated forward with compiled masks
    (heads/ff/layer gates — exactly linear-foldable)."""
    cfg = tiny_wavlm()
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    pcfg = PruneConfig(prune_conv_channels=False)
    gates_la = init_gates(jax.random.PRNGKey(1), cfg, pcfg)
    # push some log_alphas strongly negative so units are really pruned
    gates_la["layers"][0]["heads"] = jnp.asarray([-4.0, 3.0, 3.0, -4.0])
    gates_la["layers"][1]["ff_interm"] = jnp.where(
        jnp.arange(64) % 3 == 0, -4.0, 3.0
    ).astype(jnp.float32)

    masks = compile_gates(gates_la)
    wave = jax.random.normal(jax.random.PRNGKey(2), (2, 2000)) * 0.1
    gated = wavlm_extract_features(params, cfg, wave, gates=masks)

    pruned_params, pruned_cfg = apply_pruning(params, cfg, gates_la)
    assert len(pruned_cfg.remaining_heads[0]) == 2
    assert pruned_cfg.ff_interm_features[1] < 64
    pruned = wavlm_extract_features(pruned_params, pruned_cfg, wave)

    for a, b in zip(gated, pruned):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    assert count_params_pytree(pruned_params) < count_params_pytree(params)


def test_surgery_conv_channels_shapes():
    cfg = tiny_wavlm()
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    pcfg = PruneConfig(prune_conv_channels=True, prune_attention_heads=False,
                       prune_attention_layer=False,
                       prune_feed_forward_intermediate=False,
                       prune_feed_forward_layer=False)
    gates_la = init_gates(jax.random.PRNGKey(1), cfg, pcfg)
    gates_la["conv"][0] = jnp.where(jnp.arange(16) < 10, 6.0, -6.0).astype(jnp.float32)
    gates_la["conv"][2] = jnp.where(jnp.arange(16) % 2 == 0, 6.0, -6.0).astype(jnp.float32)

    pruned_params, pruned_cfg = apply_pruning(params, cfg, gates_la)
    assert pruned_cfg.conv_layers[0][0] == 10
    assert pruned_cfg.conv_layers[2][0] == 8
    wave = jax.random.normal(jax.random.PRNGKey(2), (1, 2000)) * 0.1
    out = wavlm_extract_features(pruned_params, pruned_cfg, wave)
    assert np.isfinite(np.asarray(out[-1])).all()

    # last-layer conv mask becomes an output_scale (reference dummy_weight),
    # never folded through the projection LayerNorm
    assert "output_scale" in pruned_params["feature_extractor"]
    # NOTE: gated-vs-pruned outputs are NOT bit-equal for last-layer conv
    # pruning: the projection LayerNorm sees 16-channels-with-zeros before
    # surgery and 8 channels after — the reference's prune_layer_norm has the
    # exact same approximation (pruning_utils.py:43-52), which is why the
    # recipe follows surgery with further distillation. The extractor output
    # up to that LN IS exactly equivalent:
    masks = compile_gates(gates_la)
    from diarizen_tpu.models.wavlm import _feature_extractor

    gated_fx = _feature_extractor(params, cfg, wave, jnp.float32, gates=masks)
    pruned_fx = _feature_extractor(pruned_params, pruned_cfg, wave, jnp.float32)
    keep_last = np.nonzero(np.asarray(masks["conv"][2]))[0]
    np.testing.assert_allclose(
        np.asarray(gated_fx)[:, :, keep_last], np.asarray(pruned_fx),
        rtol=1e-4, atol=1e-5,
    )
