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
