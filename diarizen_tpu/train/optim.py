"""Optimizers / schedulers / gradient clipping for diarizen_tpu training.

Capability parity with the reference training runtime:
  * constant / linear warmup schedulers (diarizen/optimization.py:1-35);
  * dual-LR optimizer: small LR on the WavLM trunk, big LR on the rest
    (recipes/diar_ssl/run_dual_opt.py:38-49) — built as a single
    optax.multi_transform so one pjit train step handles both groups;
  * percentile auto grad clipping: clip to the p-th percentile of the last
    N global grad norms (recipes/diar_ssl/trainer_dual_opt.py:24-39) — the
    history ring buffer lives inside the optimizer state so it is jit-able
    and checkpointable;
  * NaN/Inf-loss batch skipping (trainer_dual_opt.py:60-61) is handled in
    the train step (see step.py), not here.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_schedule(
    base_lr: float, warmup_steps: int, kind: str = "linear"
) -> optax.Schedule:
    """'linear': ramp 0 -> base_lr over warmup_steps then constant.
    'constant': base_lr * min(1, step/warmup) identical ramp (the reference's
    'constant' LambdaLR returns 1.0 after warmup too) — both reduce to the
    same shape here; kept for config compatibility."""
    if warmup_steps <= 0:
        return optax.constant_schedule(base_lr)
    del kind

    def schedule(step):
        frac = jnp.minimum(1.0, (step + 1) / warmup_steps)
        return base_lr * frac

    return schedule


def noam_schedule(model_size: int, warmup: int, factor: float = 1.0) -> optax.Schedule:
    """Noam LR: d^-0.5 * min(step^-0.5, step * warmup^-1.5)
    (reference diarizen/noam_updater.py:10-65)."""

    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)
        return factor * model_size ** -0.5 * jnp.minimum(s ** -0.5, s * warmup ** -1.5)

    return schedule


def noam_adamw(model_size: int, warmup: int, factor: float = 1.0,
               weight_decay: float = 0.0) -> optax.GradientTransformation:
    return optax.adamw(noam_schedule(model_size, warmup, factor), weight_decay=weight_decay)


class AutoClipState(NamedTuple):
    history: jnp.ndarray  # (capacity,) grad-norm ring buffer
    count: jnp.ndarray  # () int32 number of valid entries


def auto_clip_by_percentile(
    percentile: float = 90.0, history_len: int = 1000
) -> optax.GradientTransformation:
    """AutoClip: record the global grad norm, clip to the given percentile of
    the recorded history (incl. the current step)."""

    def init_fn(params):
        del params
        return AutoClipState(
            history=jnp.zeros((history_len,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        idx = state.count % history_len
        history = state.history.at[idx].set(g_norm)
        count = state.count + 1
        n_valid = jnp.minimum(count, history_len)
        # percentile over the valid prefix: mask invalid slots to +inf and
        # use the sorted array (jit-friendly, fixed shapes)
        mask = jnp.arange(history_len) < n_valid
        vals = jnp.where(mask, history, jnp.inf)
        vals = jnp.sort(vals)
        # linear-interpolated percentile over n_valid entries (numpy default)
        pos = (percentile / 100.0) * (n_valid.astype(jnp.float32) - 1.0)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, history_len - 1)
        hi = jnp.clip(lo + 1, 0, history_len - 1)
        frac = pos - lo.astype(jnp.float32)
        lo_v = vals[lo]
        hi_v = jnp.where(hi < n_valid, vals[hi], lo_v)
        clip_value = lo_v + frac * (hi_v - lo_v)

        scale = jnp.minimum(1.0, clip_value / jnp.maximum(g_norm, 1e-12))
        updates = jax.tree_util.tree_map(lambda u: u * scale, updates)
        return updates, AutoClipState(history=history, count=count)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_with_warmup(
    lr: float,
    warmup_steps: int = 0,
    weight_decay: float = 0.01,
    clip_percentile: Optional[float] = 90.0,
    clip_history: int = 1000,
) -> optax.GradientTransformation:
    chain = []
    if clip_percentile is not None:
        chain.append(auto_clip_by_percentile(clip_percentile, clip_history))
    chain.append(optax.adamw(warmup_schedule(lr, warmup_steps), weight_decay=weight_decay))
    return optax.chain(*chain)


def one_cycle_schedule(max_lr: float, total_steps: int, pct_start: float = 0.3) -> optax.Schedule:
    """OneCycle LR (reference trainer option `use_one_cycle_lr`,
    trainer_dual_opt.py:330-362)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps, peak_value=max_lr, pct_start=pct_start
    )


def reduce_on_plateau(
    factor: float = 0.5, patience: int = 3, min_scale: float = 1e-3
) -> optax.GradientTransformation:
    """ReduceLROnPlateau (reference `lr_decay` option): wrap after the base
    optimizer and feed the monitored value via
    `optimizer.update(..., value=loss)` (optax.contrib API)."""
    return optax.contrib.reduce_on_plateau(
        factor=factor, patience=patience, min_scale=min_scale
    )


def with_gradient_accumulation(
    optimizer: optax.GradientTransformation, every_k: int
) -> optax.GradientTransformation:
    """Gradient accumulation over k micro-batches (reference
    `accelerator.accumulate`, trainer_dual_opt.py:470) as optax.MultiSteps —
    the train step stays unchanged; params update every k-th call."""
    if every_k <= 1:
        return optimizer
    return optax.MultiSteps(optimizer, every_k_schedule=every_k)


def dual_lr_optimizer(
    labels: Any,
    lr_small: float = 2e-5,
    lr_big: float = 1e-3,
    warmup_steps: int = 0,
    weight_decay: float = 0.01,
    clip_percentile: Optional[float] = 90.0,
    freeze_wavlm: bool = False,
) -> optax.GradientTransformation:
    """One optimizer, two LR groups ('wavlm' small / 'other' big) — the
    reference's optimizer_small/optimizer_big split as an optax
    multi_transform over the label pytree from eend.non_wavlm_param_labels.
    `freeze_wavlm` zeroes the trunk's updates (reference trainer option)."""
    wavlm_opt = (
        optax.set_to_zero()
        if freeze_wavlm
        else optax.adamw(warmup_schedule(lr_small, warmup_steps), weight_decay=weight_decay)
    )
    opt = optax.multi_transform(
        {
            "wavlm": wavlm_opt,
            "other": optax.adamw(
                warmup_schedule(lr_big, warmup_steps), weight_decay=weight_decay
            ),
        },
        labels,
    )
    if clip_percentile is None:
        return opt
    return optax.chain(auto_clip_by_percentile(clip_percentile), opt)


def adamw_torch_args(
    lr: float = 1e-3,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    **_ignored,
) -> optax.GradientTransformation:
    """AdamW with the torch constructor surface (aliased from
    `torch.optim.AdamW` in config.resolve so verbatim reference
    [optimizer] TOML sections build the optax equivalent; torch defaults:
    eps 1e-8, weight_decay 1e-2 — optax's differ)."""
    return optax.adamw(
        lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )
