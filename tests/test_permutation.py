"""PIT permutation tests: on-device exhaustive search must agree with the
host Hungarian path (reference: tests/utils/test_permutation.py)."""

import numpy as np
import jax.numpy as jnp

from diarizen_tpu.ops.permutation import permutate_enumerate, permutate_hungarian


def test_identity_permutation():
    rng = np.random.default_rng(0)
    y = rng.random((3, 20, 4)).astype(np.float32)
    permutated, perms = permutate_enumerate(jnp.asarray(y), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(permutated), y, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(perms), np.tile(np.arange(4), (3, 1)))


def test_recovers_known_permutation():
    rng = np.random.default_rng(1)
    y1 = rng.random((2, 30, 4)).astype(np.float32)
    perm = [2, 0, 3, 1]
    inverse = np.argsort(perm)
    y2 = y1[:, :, inverse]
    permutated, perms = permutate_enumerate(jnp.asarray(y1), jnp.asarray(y2))
    np.testing.assert_allclose(np.asarray(permutated), y1, atol=1e-7)


def test_enumerate_matches_hungarian():
    rng = np.random.default_rng(2)
    for _ in range(5):
        y1 = rng.random((4, 16, 4)).astype(np.float32)
        y2 = rng.random((4, 16, 4)).astype(np.float32)
        p_enum, _ = permutate_enumerate(jnp.asarray(y1), jnp.asarray(y2))
        p_hung, _ = permutate_hungarian(y1, y2)
        # same total cost (permutation itself may differ on ties)
        cost_enum = np.mean((np.asarray(p_enum) - y1) ** 2)
        cost_hung = np.mean((p_hung - y1) ** 2)
        np.testing.assert_allclose(cost_enum, cost_hung, atol=1e-6)
