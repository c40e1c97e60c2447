"""Fused conv-chain kernel vs XLA oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diarizen_tpu.ops.conv_chain import KERNELS, fused_conv_chain, xla_conv_chain


@pytest.mark.parametrize("t_out", [32, 65, 399], ids=["1tile", "3tile-ragged", "wavlm-8s"])
def test_fused_chain_matches_xla(t_out):
    rng = np.random.default_rng(0)
    t1 = t_out * 64 + 95  # exact coverage
    x1 = rng.standard_normal((1, t1, 512)).astype(np.float32) * 0.5
    weights = [
        (rng.standard_normal((k, 512, 512)) * (1.0 / np.sqrt(512 * k))).astype(np.float32)
        for k in KERNELS
    ]
    expected = np.asarray(xla_conv_chain(jnp.asarray(x1), [jnp.asarray(w) for w in weights], t_out))
    got = np.asarray(fused_conv_chain(jnp.asarray(x1), [jnp.asarray(w) for w in weights], t_out, interpret=True))
    assert got.shape == expected.shape == (1, t_out, 512)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)
