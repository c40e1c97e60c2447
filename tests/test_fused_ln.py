"""Pallas fused residual+LN(+acc) kernels (ops/fused_ln.py) vs plain XLA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diarizen_tpu.models.common import layer_norm
from diarizen_tpu.ops.fused_ln import residual_ln, residual_ln_acc


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(4, 39, 96), (2, 7, 128), (12768 // 16, 768)])
def test_residual_ln_matches_xla(rng, dtype, shape):
    a = jnp.asarray(rng.standard_normal(shape), dtype)
    b = jnp.asarray(rng.standard_normal(shape), dtype)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    p = {"scale": gamma, "bias": beta}
    expected = layer_norm(p, (a.astype(jnp.float32) + b.astype(jnp.float32))
                          .astype(dtype))
    got = residual_ln(a, b, gamma, beta)
    assert got.dtype == dtype
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(expected, np.float32),
                               rtol=tol, atol=tol)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_residual_ln_acc_matches_xla(rng, dtype):
    shape = (3, 41, 256)
    a = jnp.asarray(rng.standard_normal(shape), dtype)
    b = jnp.asarray(rng.standard_normal(shape), dtype)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    acc = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(0.37, jnp.float32)

    y, new_acc = residual_ln_acc(a, b, gamma, beta, w, acc)
    y_ref = residual_ln(a, b, gamma, beta)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6)
    expected_acc = np.asarray(acc) + 0.37 * np.asarray(y_ref, np.float32)
    tol = 1e-6 if dtype == jnp.float32 else 1e-3
    np.testing.assert_allclose(np.asarray(new_acc), expected_acc, rtol=tol, atol=tol)
    assert new_acc.dtype == jnp.float32


def test_fused_path_matches_xla_path_full_model(rng):
    """wavlm_extract_features with the fused kernels on vs off: identical
    hidden states and fused weighted sum (f32, eval path)."""
    from diarizen_tpu.models.wavlm import (
        WavLMConfig, init_wavlm_params, set_fused_ln, wavlm_extract_features,
    )

    n = 3
    cfg = WavLMConfig(
        conv_layers=((16, 10, 5), (16, 4, 4), (16, 4, 4)),
        embed_dim=64, num_layers=n,
        use_attention=(True, True, False),
        use_feed_forward=(True, False, True),
        total_num_heads=(4,) * n,
        remaining_heads=(tuple(range(4)), (1, 3), ()),
        ff_interm_features=(96,) * n,
        num_buckets=40, max_distance=100, layer_drop=0.0,
    )
    params = init_wavlm_params(jax.random.PRNGKey(0), cfg)
    wave = jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32) * 0.1
    lw = jnp.asarray(rng.uniform(0.1, 1.0, n + 1), jnp.float32)

    try:
        set_fused_ln(False)
        ref_hidden = wavlm_extract_features(params, cfg, wave, train=False)
        ref_ws = wavlm_extract_features(params, cfg, wave, train=False,
                                        layer_weights=lw)
        set_fused_ln(True)
        got_hidden = wavlm_extract_features(params, cfg, wave, train=False)
        got_ws = wavlm_extract_features(params, cfg, wave, train=False,
                                        layer_weights=lw)
    finally:
        set_fused_ln(None)

    assert len(got_hidden) == len(ref_hidden)
    for g, r in zip(got_hidden, ref_hidden):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ws), np.asarray(ref_ws),
                               rtol=1e-5, atol=1e-5)


def test_fused_ln_custom_vjp_matches_xla_grads(rng):
    """Eval-mode gradients through the fused kernels (TP parity tests
    differentiate the eval forward) must match the XLA composition."""
    shape = (2, 9, 64)
    a = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, shape[-1]), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(shape[-1]), jnp.float32)
    acc = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(0.61, jnp.float32)

    def fused(args):
        a, b, g, be, w, acc = args
        y, acc2 = residual_ln_acc(a, b, g, be, w, acc)
        return jnp.sum(y * 1.3) + jnp.sum(acc2 * 0.7)

    def ref(args):
        a, b, g, be, w, acc = args
        y = layer_norm({"scale": g, "bias": be}, a + b)
        acc2 = acc + w * y
        return jnp.sum(y * 1.3) + jnp.sum(acc2 * 0.7)

    args = (a, b, gamma, beta, w, acc)
    g_fused = jax.grad(fused)(args)
    g_ref = jax.grad(ref)(args)
    for gf, gr, name in zip(g_fused, g_ref, "a b gamma beta w acc".split()):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-5, atol=2e-5, err_msg=name)

    def fused_plain(args):
        a, b, g, be = args
        return jnp.sum(residual_ln(a, b, g, be) * 0.9)

    def ref_plain(args):
        a, b, g, be = args
        return jnp.sum(layer_norm({"scale": g, "bias": be}, a + b) * 0.9)

    g_fused = jax.grad(fused_plain)((a, b, gamma, beta))
    g_ref = jax.grad(ref_plain)((a, b, gamma, beta))
    for gf, gr, name in zip(g_fused, g_ref, "a b gamma beta".split()):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-5, atol=2e-5, err_msg=name)
