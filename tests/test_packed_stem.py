"""Packed-stem ResNet path vs the plain conv path.

The lane-packed stem (resnet.py:_packed_stem) computes the exact same MAC
set as the plain path — block-Toeplitz repacking only re-associates XLA's
f32 accumulation — so the two paths must agree to float tolerance for any
time length, including lengths whose conv tails hit the zero-padding masks
(T % 4 != 0 exercises m1; T % 4 in {1, 2} exercises m2).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diarizen_tpu.models.resnet import (
    ResNetConfig,
    init_resnet_params,
    resnet_forward,
)


@pytest.mark.parametrize("t", [798, 797, 796, 795, 160])
def test_packed_stem_matches_plain(t):
    cfg = ResNetConfig(packed_stem=True)
    cfg_plain = dataclasses.replace(cfg, packed_stem=False)
    params = init_resnet_params(jax.random.PRNGKey(0), cfg)
    fbank = jax.random.normal(jax.random.PRNGKey(1), (2, t, 80), jnp.float32)

    got = np.asarray(jax.jit(lambda p, f: resnet_forward(p, cfg, f))(params, fbank))
    ref = np.asarray(jax.jit(lambda p, f: resnet_forward(p, cfg_plain, f))(params, fbank))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_packed_stem_with_pooling_weights():
    cfg = ResNetConfig()
    params = init_resnet_params(jax.random.PRNGKey(0), cfg)
    fbank = jax.random.normal(jax.random.PRNGKey(1), (2, 399, 80), jnp.float32)
    weights = (jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 399)) > 0.3).astype(jnp.float32)

    got = np.asarray(resnet_forward(params, cfg, fbank, weights))
    ref = np.asarray(
        resnet_forward(params, dataclasses.replace(cfg, packed_stem=False), fbank, weights)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
