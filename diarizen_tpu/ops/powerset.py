"""Powerset <-> multilabel conversion for EEND powerset training.

Behavior parity with the reference converter
(pyannote-audio/pyannote/audio/utils/powerset.py:37-229): classes are ordered
by set size then lexicographically, e.g. for (num_classes=3, max_set_size=2):
{}, {0}, {1}, {2}, {0,1}, {0,2}, {1,2}.

The mapping matrix is built with numpy at trace time (static), conversions are
jittable jnp ops.
"""

from __future__ import annotations

from functools import lru_cache
from itertools import combinations, permutations
from math import comb
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def num_powerset_classes(num_classes: int, max_set_size: int) -> int:
    return sum(comb(num_classes, k) for k in range(max_set_size + 1))


@lru_cache(maxsize=None)
def _mapping_np(num_classes: int, max_set_size: int) -> np.ndarray:
    n_ps = num_powerset_classes(num_classes, max_set_size)
    mapping = np.zeros((n_ps, num_classes), dtype=np.float32)
    k = 0
    for set_size in range(max_set_size + 1):
        for subset in combinations(range(num_classes), set_size):
            mapping[k, list(subset)] = 1.0
            k += 1
    return mapping


class Powerset:
    """Stateless converter. All methods are jit-friendly."""

    def __init__(self, num_classes: int, max_set_size: int):
        self.num_classes = num_classes
        self.max_set_size = max_set_size
        self.num_powerset_classes = num_powerset_classes(num_classes, max_set_size)
        self.mapping = _mapping_np(num_classes, max_set_size)  # (P, K) numpy
        self.cardinality = self.mapping.sum(axis=1)

    def to_multilabel(self, powerset: jnp.ndarray, soft: bool = False) -> jnp.ndarray:
        """(..., P) log-probabilities -> (..., K) multilabel.

        soft=False: hard argmax one-hot; soft=True: exp(log-probs).
        """
        mapping = jnp.asarray(self.mapping, dtype=powerset.dtype)
        if soft:
            probs = jnp.exp(powerset)
        else:
            probs = jax.nn.one_hot(
                jnp.argmax(powerset, axis=-1),
                self.num_powerset_classes,
                dtype=powerset.dtype,
            )
        return probs @ mapping

    def to_powerset(self, multilabel: jnp.ndarray) -> jnp.ndarray:
        """(..., K) hard multilabel -> (..., P) one-hot powerset."""
        mapping = jnp.asarray(self.mapping, dtype=multilabel.dtype)
        idx = jnp.argmax(multilabel @ mapping.T, axis=-1)
        return jnp.eye(self.num_powerset_classes, dtype=multilabel.dtype)[idx]

    def to_powerset_index(self, multilabel: jnp.ndarray) -> jnp.ndarray:
        """(..., K) hard multilabel -> (...,) integer powerset class index.

        Ties broken toward the lowest index, i.e. a multilabel vector with more
        than max_set_size active speakers maps to the matching subset with the
        largest overlap, lowest index first (same as reference argmax).
        """
        mapping = jnp.asarray(self.mapping, dtype=multilabel.dtype)
        return jnp.argmax(multilabel @ mapping.T, axis=-1)

    @lru_cache(maxsize=None)
    def _permutation_mapping(self) -> Dict[Tuple[int, ...], Tuple[int, ...]]:
        """Multilabel permutation -> powerset class permutation.

        For each permutation p of the K classes, returns the permutation q of
        the P powerset classes such that permuting powerset scores by q equals
        permuting the underlying labels by p.
        (Reference semantics: utils/powerset.py:158-229.)
        """
        mapping = self.mapping.astype(np.int64)
        pow2 = 1 << np.arange(self.num_classes)
        before = (mapping * pow2).sum(axis=1)
        out: Dict[Tuple[int, ...], Tuple[int, ...]] = {}
        for perm in permutations(range(self.num_classes)):
            after = (mapping[:, list(perm)] * pow2).sum(axis=1)
            # q[j] = i such that after[i] == before[j]
            q = np.argmax(before[:, None] == after[None, :], axis=1)
            out[perm] = tuple(int(v) for v in q)
        return out

    @property
    def permutation_mapping(self) -> Dict[Tuple[int, ...], Tuple[int, ...]]:
        return self._permutation_mapping()

    def permutation_matrix(self) -> np.ndarray:
        """(K!, P) int array: row i = powerset permutation for the i-th
        multilabel permutation in itertools order. Useful for on-device PIT
        over all K! permutations."""
        perms = list(permutations(range(self.num_classes)))
        return np.stack(
            [np.array(self.permutation_mapping[p]) for p in perms], axis=0
        )
