"""Powerset converter tests.

Mirrors the reference test strategy
(pyannote-audio/tests/utils/test_powerset.py:29-77): roundtrip and
permutation consistency over all (num_classes <= 5, set sizes).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from diarizen_tpu.ops.powerset import Powerset, num_powerset_classes


def test_num_powerset_classes():
    assert num_powerset_classes(4, 2) == 11  # {} + 4 singles + 6 pairs
    assert num_powerset_classes(3, 2) == 7
    assert num_powerset_classes(3, 3) == 8


def test_mapping_structure():
    ps = Powerset(3, 2)
    expected = np.array(
        [
            [0, 0, 0],
            [1, 0, 0],
            [0, 1, 0],
            [0, 0, 1],
            [1, 1, 0],
            [1, 0, 1],
            [0, 1, 1],
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(ps.mapping, expected)
    np.testing.assert_array_equal(ps.cardinality, [0, 1, 1, 1, 2, 2, 2])


@pytest.mark.parametrize("num_classes", [2, 3, 4, 5])
@pytest.mark.parametrize("max_set_size", [1, 2, 3])
def test_roundtrip(num_classes, max_set_size):
    if max_set_size > num_classes:
        pytest.skip("set size larger than class count")
    ps = Powerset(num_classes, max_set_size)
    # every valid multilabel (sum <= max_set_size) must roundtrip exactly
    for p in range(ps.num_powerset_classes):
        one_hot = jnp.zeros((1, 1, ps.num_powerset_classes)).at[0, 0, p].set(1.0)
        log_probs = jnp.log(one_hot + 1e-12)
        multilabel = ps.to_multilabel(log_probs)
        back = ps.to_powerset(multilabel)
        assert int(jnp.argmax(back)) == p


def test_permutation_mapping_matches_reference_example():
    # reference docstring example (utils/powerset.py:203-218)
    ps = Powerset(3, 2)
    expected = {
        (0, 1, 2): (0, 1, 2, 3, 4, 5, 6),
        (0, 2, 1): (0, 1, 3, 2, 5, 4, 6),
        (1, 0, 2): (0, 2, 1, 3, 4, 6, 5),
        (1, 2, 0): (0, 2, 3, 1, 6, 4, 5),
        (2, 0, 1): (0, 3, 1, 2, 5, 6, 4),
        (2, 1, 0): (0, 3, 2, 1, 6, 5, 4),
    }
    assert ps.permutation_mapping == expected


def test_permutation_consistency():
    """Permuting multilabel columns == permuting powerset classes."""
    rng = np.random.default_rng(0)
    for num_classes, max_set_size in [(3, 2), (4, 2), (4, 3)]:
        ps = Powerset(num_classes, max_set_size)
        scores = jnp.asarray(rng.normal(size=(2, 5, ps.num_powerset_classes)))
        log_probs = jnp.log(jnp.exp(scores) / jnp.exp(scores).sum(-1, keepdims=True))
        for ml_perm, pw_perm in ps.permutation_mapping.items():
            permuted_scores = log_probs[..., list(pw_perm)]
            ml_a = ps.to_multilabel(permuted_scores, soft=True)
            ml_b = ps.to_multilabel(log_probs, soft=True)[..., list(ml_perm)]
            np.testing.assert_allclose(np.asarray(ml_a), np.asarray(ml_b), atol=1e-6)
