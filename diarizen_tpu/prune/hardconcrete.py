"""Hard-Concrete L0 gates (functional).

Reference: diarizen/models/module/wav2vec2/hardconcrete.py:21-131 (stretched
hard-concrete distribution from FLOP/DPHuBERT/CoFi). Train-time masks are
sampled with the logistic reparameterization (jit-able, differentiable
through log_alpha); eval-time "compiled" masks use the data-dependent
top-k-zero rule and are computed ON HOST (numpy) — the k is value-dependent
so it cannot live under jit (SURVEY.md section 7 'hard parts').
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

BETA = 2.0 / 3.0
LIMIT_L = -0.1
LIMIT_R = 1.1
EPS = 1e-6


def hc_bias(beta: float = BETA, limit_l: float = LIMIT_L, limit_r: float = LIMIT_R) -> float:
    return -beta * math.log(-limit_l / limit_r)


def init_log_alpha(
    rng: jax.Array, n: int, init_mean: float = 0.5, init_std: float = 0.01
) -> jnp.ndarray:
    """log_alpha ~ N(log(1-m) - log(m), std) (hardconcrete.py:79-83)."""
    mean = math.log(1 - init_mean) - math.log(init_mean)
    return mean + init_std * jax.random.normal(rng, (n,))


def l0_norm(log_alpha: jnp.ndarray, beta: float = BETA) -> jnp.ndarray:
    """Expected number of alive units; differentiable (hardconcrete.py:85-92)."""
    return jax.nn.sigmoid(log_alpha + hc_bias(beta)).sum()


def sample_mask(
    log_alpha: jnp.ndarray,
    rng: jax.Array,
    beta: float = BETA,
    limit_l: float = LIMIT_L,
    limit_r: float = LIMIT_R,
    eps: float = EPS,
) -> jnp.ndarray:
    """Train-time stochastic mask in [0, 1] (hardconcrete.py:101-108)."""
    u = jax.random.uniform(rng, log_alpha.shape, minval=eps, maxval=1 - eps)
    s = jax.nn.sigmoid((jnp.log(u / (1 - u)) + log_alpha) / beta)
    s = s * (limit_r - limit_l) + limit_l
    return jnp.clip(s, 0.0, 1.0)


def compiled_mask(log_alpha: np.ndarray, beta: float = BETA) -> np.ndarray:
    """Deterministic eval mask: zero the `round(n - l0)` smallest soft-mask
    entries of sigmoid(log_alpha / beta * 0.8) (hardconcrete.py:110-123).
    Host numpy (value-dependent k)."""
    log_alpha = np.asarray(log_alpha, dtype=np.float64)
    n = log_alpha.shape[0]
    expected_zeros = n - float((1 / (1 + np.exp(-(log_alpha + hc_bias(beta))))).sum())
    num_zeros = round(expected_zeros)
    soft = 1 / (1 + np.exp(-log_alpha / beta * 0.8))
    if num_zeros > 0:
        idx = np.argsort(soft)[:num_zeros]
        soft = soft.copy()
        soft[idx] = 0.0
    return soft.astype(np.float32)
