"""Pallas fused-gated-bias attention kernel vs the XLA oracle (interpret mode
on the CPU mesh; the same kernel compiles natively on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diarizen_tpu.ops.flash_attention import (
    flash_attention_gated_bias,
    xla_attention_gated_bias,
)


@pytest.mark.parametrize("t", [64, 399], ids=["aligned", "wavlm-8s"])
def test_flash_matches_xla(t):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    pos = rng.standard_normal((h, t, t)).astype(np.float32)
    gate = rng.uniform(1.0, 2.0, (b, h, t)).astype(np.float32)

    expected = np.asarray(xla_attention_gated_bias(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos), jnp.asarray(gate)))
    got = np.asarray(flash_attention_gated_bias(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos),
        jnp.asarray(gate), interpret=True))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_flash_bf16():
    rng = np.random.default_rng(1)
    b, h, t, d = 1, 2, 130, 64
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    pos = rng.standard_normal((h, t, t)).astype(np.float32)
    gate = rng.uniform(1.0, 2.0, (b, h, t)).astype(np.float32)

    expected = np.asarray(xla_attention_gated_bias(
        *[jnp.asarray(x) for x in (q, k, v, pos, gate)])).astype(np.float32)
    got = np.asarray(flash_attention_gated_bias(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), jnp.asarray(pos), jnp.asarray(gate),
        interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, expected, rtol=0.1, atol=0.05)


def test_wavlm_flash_path_matches_xla_path():
    """Full WavLM forward: flash vs XLA attention paths agree."""
    from diarizen_tpu.models.wavlm import (
        WavLMConfig,
        init_wavlm_params,
        set_flash_attention,
        wavlm_extract_features,
    )

    n = 2
    cfg = WavLMConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        embed_dim=128, num_layers=n,
        use_attention=(True,) * n, use_feed_forward=(True,) * n,
        total_num_heads=(2,) * n,
        remaining_heads=(tuple(range(2)), (1,)),  # heterogeneous head subset
        ff_interm_features=(128,) * n, num_buckets=16, max_distance=20,
        layer_drop=0.0, dropout=0.0, attention_dropout=0.0, projection_dropout=0.0,
    )
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 4000)) * 0.1

    set_flash_attention(False)
    ref = wavlm_extract_features(params, cfg, wave)
    try:
        set_flash_attention(True)
        got = wavlm_extract_features(params, cfg, wave)
    finally:
        set_flash_attention(None)

    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)


def test_flash_long_sequence_f32():
    """Long-T f32 case must pick VMEM-safe blocks (regression: 1599-frame
    chunks at f32 OOMed scoped VMEM with the fixed hb=4/bq=512 choice)."""
    from diarizen_tpu.ops.flash_attention import _pick_blocks, _vmem_bytes, VMEM_BUDGET

    blocks = _pick_blocks(h=4, t=1599, dp=128, itemsize=4)
    assert blocks is not None
    hb, bq = blocks
    tp = ((1599 + bq - 1) // bq) * bq
    assert _vmem_bytes(hb, bq, tp, 128, 4) <= VMEM_BUDGET

    rng = np.random.default_rng(0)
    b, h, t, d = 1, 2, 700, 64
    q = rng.standard_normal((b, h, t, d)).astype(np.float32)
    k = rng.standard_normal((b, h, t, d)).astype(np.float32)
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    pos = rng.standard_normal((h, t, t)).astype(np.float32)
    gate = rng.uniform(1.0, 2.0, (b, h, t)).astype(np.float32)
    expected = np.asarray(xla_attention_gated_bias(
        *[jnp.asarray(x) for x in (q, k, v, pos, gate)]))
    got = np.asarray(flash_attention_gated_bias(
        *[jnp.asarray(x) for x in (q, k, v, pos, gate)], interpret=True))
    np.testing.assert_allclose(got, expected, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("t", [64, 130], ids=["aligned", "ragged"])
def test_flash_backward_matches_xla(t):
    """Custom-VJP flash backward vs XLA autodiff on all five inputs."""
    from diarizen_tpu.ops.flash_attention import flash_attention_gated_bias_trainable

    rng = np.random.default_rng(3)
    b, h, d = 2, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((h, t, t)), jnp.float32)
    gate = jnp.asarray(rng.uniform(1.0, 2.0, (b, h, t)), jnp.float32)
    tangent = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)

    def loss_flash(*args):
        return jnp.sum(flash_attention_gated_bias_trainable(*args) * tangent)

    def loss_xla(*args):
        return jnp.sum(xla_attention_gated_bias(*args) * tangent)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, pos, gate)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, v, pos, gate)
    for name, a, b_ in zip(["dq", "dk", "dv", "dpos", "dgate"], g_flash, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_wavlm_train_grads_flash_vs_xla():
    """Full-model gradient parity: flash-train path vs XLA path (dropout 0)."""
    from diarizen_tpu.models.wavlm import (
        WavLMConfig,
        init_wavlm_params,
        set_flash_attention,
        wavlm_extract_features,
    )

    n = 2
    cfg = WavLMConfig(
        conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
        embed_dim=64, num_layers=n,
        use_attention=(True,) * n, use_feed_forward=(True,) * n,
        total_num_heads=(2,) * n, remaining_heads=(tuple(range(2)),) * n,
        ff_interm_features=(64,) * n, num_buckets=16, max_distance=20,
        layer_drop=0.0, dropout=0.0, attention_dropout=0.0, projection_dropout=0.0,
    )
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 3000)) * 0.1

    def loss(p, flag):
        set_flash_attention(flag)
        try:
            hs = wavlm_extract_features(p, cfg, wave, train=True, rng=None)
            return jnp.mean(hs[-1] ** 2)
        finally:
            set_flash_attention(None)

    g_xla = jax.grad(lambda p: loss(p, False))(params)
    g_flash = jax.grad(lambda p: loss(p, True))(params)
    flat_x = jax.tree_util.tree_leaves(g_xla)
    flat_f = jax.tree_util.tree_leaves(g_flash)
    for a, b in zip(flat_x, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)


def test_flash_dropout_forward():
    """In-kernel dropout: deterministic per seed, unbiased in expectation."""
    rng = np.random.default_rng(4)
    b, h, t, d = 2, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((h, t, t)), jnp.float32)
    gate = jnp.asarray(rng.uniform(1.0, 2.0, (b, h, t)), jnp.float32)

    f = lambda s: flash_attention_gated_bias(
        q, k, v, pos, gate, interpret=True, dropout_rate=0.3,
        seed=jnp.asarray(s, jnp.int32))
    a1, a2 = np.asarray(f(7)), np.asarray(f(7))
    np.testing.assert_array_equal(a1, a2)  # deterministic per seed
    a3 = np.asarray(f(8))
    assert not np.allclose(a1, a3)  # seed changes the mask

    # expectation over seeds approaches the no-dropout output
    clean = np.asarray(flash_attention_gated_bias(q, k, v, pos, gate, interpret=True))
    mean = np.mean([np.asarray(f(s)) for s in range(24)], axis=0)
    corr = np.corrcoef(mean.ravel(), clean.ravel())[0, 1]
    assert corr > 0.98, corr


def test_flash_dropout_backward_consistent():
    """check_grads validates the custom VJP against numerical diff of the
    (deterministic, seeded) primal — fwd and bwd must use the same mask."""
    from jax.test_util import check_grads

    from diarizen_tpu.ops.flash_attention import flash_attention_gated_bias_trainable

    rng = np.random.default_rng(5)
    b, h, t, d = 1, 1, 64, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)) * 0.3, jnp.float32)
    pos = jnp.asarray(rng.standard_normal((h, t, t)) * 0.3, jnp.float32)
    gate = jnp.asarray(rng.uniform(1.0, 2.0, (b, h, t)), jnp.float32)
    seed = jnp.asarray(11, jnp.int32)

    def f(q_, k_, v_, pos_, gate_):
        return flash_attention_gated_bias_trainable(
            q_, k_, v_, pos_, gate_, dropout_rate=0.25, seed=seed
        ).sum()

    check_grads(f, (q, k, v, pos, gate), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


def test_dropout_plan_and_bwd_check_agree():
    """The dropout forward plan and the backward VMEM check MUST round T
    identically: if they ever disagree, a dropout forward could run the
    Pallas kernel (murmur mask) while the backward falls to the XLA vjp
    (bernoulli mask) — silently wrong gradients (code-review r4 finding)."""
    from diarizen_tpu.ops.flash_attention import (
        _bwd_vmem_ok,
        _forward_plan,
        _round_up,
    )

    for t in range(64, 801, 7):
        for d in (64, 128):
            for itemsize in (2, 4):
                for h in (4, 12, 16):
                    plan = _forward_plan(
                        h, t, _round_up(d, 128), itemsize, rate=0.1,
                        need_bwd=True,
                    )
                    if plan is not None:
                        assert _bwd_vmem_ok(h, t, d, itemsize), (h, t, d, itemsize)


def test_bwd_gate_models_launched_kernel_padding():
    """The VMEM gate must use the SAME tp the launched backward pads to
    (advisor finding, round 4: the gate rounded t to 16 while _flash_bwd
    padded to 128, so t in the straddle band — e.g. f32 d=64, t~577-592 —
    passed the gate with a real working set ~16 MB > the 14 MB cap)."""
    from diarizen_tpu.ops.flash_attention import (
        _bwd_gate_tp,
        _bwd_vmem_ok,
        _bwd_vmem_ok_tp,
        _round_up,
    )

    for t in range(64, 1025, 1):
        assert _bwd_gate_tp(t) == _round_up(t, 128)
        for d in (64, 128):
            for itemsize in (2, 4):
                # the gate's verdict equals the verdict computed with the
                # kernel's true padding — no straddle band survives
                assert _bwd_vmem_ok(4, t, d, itemsize) == _bwd_vmem_ok_tp(
                    _round_up(t, 128), _round_up(d, 128), itemsize
                )
    # the round-4 straddle case specifically: f32, d=64, t=580
    t, d, itemsize = 580, 64, 4
    loose = _bwd_vmem_ok_tp(_round_up(t, 16), _round_up(d, 128), itemsize)
    tight = _bwd_vmem_ok_tp(_round_up(t, 128), _round_up(d, 128), itemsize)
    assert loose and not tight  # the band exists...
    assert not _bwd_vmem_ok(4, t, d, itemsize)  # ...and the gate rejects it


def test_softmax_modes_match_f32():
    """set_softmax_mode("deferred"/"bf16") — the round-5 VPU-softmax
    levers — must agree with the exact f32 softmax: "deferred" to float-
    reassociation tolerance, "bf16" to bf16 exp-panel tolerance."""
    from diarizen_tpu.ops.flash_attention import (
        flash_attention_gated_bias,
        set_softmax_mode,
    )

    b, h, t, d = 2, 4, 57, 32
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    q = jax.random.normal(ks[0], (b, h, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, h, t, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, h, t, d), jnp.float32)
    bias = jax.random.normal(ks[3], (h, t, t), jnp.float32)
    gate = jax.nn.sigmoid(jax.random.normal(ks[4], (b, h, t), jnp.float32))

    try:
        set_softmax_mode("f32")
        ref = flash_attention_gated_bias(q, k, v, bias, gate, interpret=True)
        set_softmax_mode("deferred")
        got_d = flash_attention_gated_bias(q, k, v, bias, gate, interpret=True)
        set_softmax_mode("bf16")
        got_b = flash_attention_gated_bias(q, k, v, bias, gate, interpret=True)
    finally:
        set_softmax_mode("f32")

    np.testing.assert_allclose(got_d, ref, rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(got_b, ref, rtol=2e-2, atol=2e-2)
    # the deferred/bf16 modes must never leak into the differentiable path:
    # _need_bwd forces the exact-f32 kernel so the custom-vjp forward and
    # its f32-recomputing backward stay consistent
    set_softmax_mode("bf16")
    try:
        fwd_trainable = flash_attention_gated_bias(
            q, k, v, bias, gate, interpret=True, _need_bwd=True
        )
    finally:
        set_softmax_mode("f32")
    np.testing.assert_array_equal(np.asarray(fwd_trainable), np.asarray(ref))
