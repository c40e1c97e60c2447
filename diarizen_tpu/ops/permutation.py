"""Permutation-invariant (PIT) target alignment.

The reference (pyannote-audio/pyannote/audio/utils/permutation.py:38-160)
runs a per-sample Hungarian assignment (scipy) with MSE cost on the host.
On TPU we instead enumerate all K! permutations (K <= 4 in every recipe, so
24 candidates) fully on device — exact, jit-able, no host sync inside the
training step. A host scipy path is kept for large K (constrained cluster
assignment uses it with K up to ~20).
"""

from __future__ import annotations

from functools import lru_cache
from itertools import permutations
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


@lru_cache(maxsize=None)
def _all_permutations(k: int) -> np.ndarray:
    """(k!, k) int32 array of all permutations of range(k)."""
    return np.array(list(permutations(range(k))), dtype=np.int32)


def permutate_enumerate(
    y1: jnp.ndarray, y2: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Align speaker axes of `y2` to best match `y1` under MSE cost,
    exhaustively over all permutations (exact PIT; on-device).

    Parameters
    ----------
    y1 : (B, F, K) reference (e.g. soft predictions)
    y2 : (B, F, K) to-permute (e.g. binary targets)

    Returns
    -------
    permutated_y2 : (B, F, K) = y2 with speaker columns permuted per sample
    perm_indices : (B, K) int32, permutated_y2[b, :, k] = y2[b, :, perm[b, k]]
    """
    B, F, K = y1.shape
    perms = jnp.asarray(_all_permutations(K))  # (P, K)
    # candidates[p]: y2 with columns permuted by perms[p]
    candidates = y2[:, :, perms]  # (B, F, P, K)
    candidates = jnp.moveaxis(candidates, 2, 1)  # (B, P, F, K)
    cost = jnp.mean(
        (candidates - y1[:, None]) ** 2, axis=(2, 3)
    )  # (B, P) mean squared error per permutation
    best = jnp.argmin(cost, axis=1)  # (B,)
    perm_indices = perms[best]  # (B, K)
    permutated = jnp.take_along_axis(y2, perm_indices[:, None, :], axis=2)
    return permutated, perm_indices


def permutate_hungarian(
    y1: np.ndarray, y2: np.ndarray, cost: str = "mse"
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side Hungarian PIT (exact for any K; reference parity path).

    Same contract as `permutate_enumerate` but on numpy arrays. Supports
    y2 with a different number of speakers than y1: y2 is padded/truncated
    column-wise to match y1's K (missing columns become zeros), matching
    reference permutate() semantics for k2 != k1.

    cost : "mse" (training PIT, reference mse_cost_func) or "mae" (the
    resegmentation pipeline's cost, reference utils/permutation.py:83-97).
    """
    B, F, K1 = y1.shape
    _, _, K2 = y2.shape
    permutated = np.zeros_like(y1)
    perm_list = np.full((B, K1), -1, dtype=np.int64)
    for b in range(B):
        # cost_mat[i, j] = cost(y1[:, i], y2[:, j])
        diff = y1[b][:, :, None] - y2[b][:, None, :]  # (F, K1, K2)
        if cost == "mse":
            cost_mat = np.mean(diff**2, axis=0)  # (K1, K2)
        elif cost == "mae":
            cost_mat = np.mean(np.abs(diff), axis=0)
        else:
            raise ValueError(f"unknown cost {cost!r}")
        row, col = linear_sum_assignment(cost_mat)
        for i, j in zip(row, col):
            permutated[b, :, i] = y2[b, :, j]
            perm_list[b, i] = j
    return permutated, perm_list


def mse_cost(y1: jnp.ndarray, y2: jnp.ndarray) -> jnp.ndarray:
    """(F, K1), (F, K2) -> (K1, K2) pairwise MSE cost."""
    return jnp.mean((y1[:, :, None] - y2[:, None, :]) ** 2, axis=0)
