"""Training losses (jit-friendly).

Reference: pyannote-audio/pyannote/audio/utils/loss.py (nll_loss,
binary_cross_entropy, mse_loss) and recipes/diar_ssl/trainer_dual_opt.py:41-57
(powerset PIT NLL).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def nll_loss(
    log_probs: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Frame-weighted negative log-likelihood.

    log_probs : (B, F, C) log-probabilities
    target : (B, F) integer class indices
    weight : optional (B, F) frame weights
    """
    picked = jnp.take_along_axis(log_probs, target[..., None], axis=-1)[..., 0]
    loss = -picked
    if weight is not None:
        return jnp.sum(loss * weight) / jnp.maximum(jnp.sum(weight), 1e-12)
    return jnp.mean(loss)


def binary_cross_entropy(
    probs: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    probs = jnp.clip(probs, eps, 1.0 - eps)
    loss = -(target * jnp.log(probs) + (1.0 - target) * jnp.log(1.0 - probs))
    if weight is not None:
        while weight.ndim < loss.ndim:
            weight = weight[..., None]
        return jnp.sum(loss * weight) / jnp.maximum(
            jnp.sum(weight) * (loss.size / weight.size), 1e-12
        )
    return jnp.mean(loss)


def mse_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    loss = (pred - target) ** 2
    if weight is not None:
        while weight.ndim < loss.ndim:
            weight = weight[..., None]
        return jnp.sum(loss * weight) / jnp.maximum(
            jnp.sum(weight) * (loss.size / weight.size), 1e-12
        )
    return jnp.mean(loss)
