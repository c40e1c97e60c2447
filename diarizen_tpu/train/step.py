"""Jittable train / eval steps for EEND segmentation training.

One compiled function per step kind; DP (and optional TP) comes from jit
sharding annotations (parallel/mesh.py) — XLA inserts the gradient
all-reduce over ICI, replacing the reference's Accelerate/NCCL DDP
(SURVEY.md section 2.5-2.6).

Reference step semantics (recipes/diar_ssl/trainer_dual_opt.py:41-72):
forward -> PIT powerset NLL -> backward -> percentile auto-clip ->
dual-LR update; NaN-loss batches skipped (:60-61) — here the skip masks the
whole update inside jit, so no host sync is needed.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from diarizen_tpu.models.eend import EendConfig
from diarizen_tpu.models.forward import segmentation_forward
from diarizen_tpu.train.loss import der_metrics, segmentation_loss


def fast_dropout_rng(rng: Optional[jax.Array]) -> Optional[jax.Array]:
    """Rebase a PRNG key onto the TPU hardware bit generator (unsafe_rbg).

    Dropout mask generation is the key consumer of random bits in a train
    step (~13 x (B, F, D) masks); with the default threefry impl those bits
    cost ~18 ms/step on v5e for WavLM-Base batch 32 x 8 s — measured 204 ->
    173 ms fwd+bwd after rebasing (PERF.md). RBG statistical quality is
    ample for dropout; streams stay deterministic per (key, shape) on a
    given backend, which is all training reproducibility needs.
    """
    if rng is None:
        return None
    data = (
        jax.random.key_data(rng)
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
        else rng
    )
    data = jnp.concatenate([data.reshape(-1)] * 2)[:4].astype(jnp.uint32)
    return jax.random.wrap_key_data(data, impl="unsafe_rbg")


def decode_batch(batch: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side decode of the compact batch transport: PCM waveforms ship
    as int16 (bit-exact x/2^15 reconstruction — halves host->device bytes,
    the train loop's dominant transfer at 16 MB/step f32 for batch 32 x 8 s)
    and binary targets as uint8. Float batches pass through unchanged."""
    xs = batch["xs"]
    if xs.dtype == jnp.int16:
        xs = xs.astype(jnp.float32) * (1.0 / 32768.0)
    target = batch["target"]
    if not jnp.issubdtype(target.dtype, jnp.floating):
        target = target.astype(jnp.float32)
    return xs, target


class TrainState(NamedTuple):
    params: Any
    model_state: Any  # BatchNorm running stats
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, model_state, optimizer) -> TrainState:
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    cfg: EendConfig,
    optimizer: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {"xs": (B, C, T) waveforms, "target": (B, F, K) binary labels}.
    Works for every segmentation family via models/forward.py dispatch.
    """
    powerset = cfg.powerset
    fwd = segmentation_forward(cfg)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        step_rng = fast_dropout_rng(jax.random.fold_in(rng, state.step))
        xs, target = decode_batch(batch)

        def loss_fn(params):
            scores, new_ms = fwd(
                params, state.model_state, cfg, xs,
                train=True, rng=step_rng, compute_dtype=compute_dtype,
            )
            return segmentation_loss(powerset, scores, target), new_ms

        (loss, new_model_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        good = jnp.isfinite(loss)
        # NaN/Inf-loss batch: zero the grads and keep old params/opt state
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads
        )
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), new, old
        )
        new_state = TrainState(
            params=keep(new_params, state.params),
            model_state=keep(new_model_state, state.model_state),
            opt_state=keep(new_opt_state, state.opt_state),
            step=state.step + 1,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm, "skipped": ~good}
        return new_state, metrics

    return train_step


def make_mc_train_step(
    cfg,  # McEendConfig
    optimizer: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
) -> Callable:
    """Multi-channel train step: train_step(state, batch, rng, num_channels).

    `num_channels` is STATIC under jit — the caller draws k in [1, C] on the
    host each step (reference model_wavlm_conformer_mc.py:262-265 does the
    random channel truncation per batch); at most C compiled variants exist.
    batch: {"xs": (B, C, T) multi-channel waveforms, "target": (B, F, K)}.
    """
    from diarizen_tpu.models.mc import eend_mc_forward

    powerset = cfg.powerset

    def train_step(state: TrainState, batch: Dict, rng: jax.Array, num_channels: int):
        step_rng = fast_dropout_rng(jax.random.fold_in(rng, state.step))
        xs, target = decode_batch(batch)

        def loss_fn(params):
            scores, _att, new_ms = eend_mc_forward(
                params, state.model_state, cfg, cfg.fusion,
                xs[:, :num_channels],
                train=True, rng=step_rng, compute_dtype=compute_dtype,
            )
            return segmentation_loss(powerset, scores, target), new_ms

        (loss, new_model_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads
        )
        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), new, old
        )
        new_state = TrainState(
            params=keep(new_params, state.params),
            model_state=keep(new_model_state, state.model_state),
            opt_state=keep(new_opt_state, state.opt_state),
            step=state.step + 1,
        )
        metrics = {"loss": loss, "grad_norm": grad_norm, "skipped": ~good}
        return new_state, metrics

    return train_step


def make_mc_eval_step(cfg, compute_dtype=jnp.bfloat16) -> Callable:
    """MC eval step (all channels, no truncation)."""
    from diarizen_tpu.models.mc import eend_mc_forward

    powerset = cfg.powerset

    def eval_step(state: TrainState, batch: Dict):
        xs, target = decode_batch(batch)
        scores, _att, _ = eend_mc_forward(
            state.params, state.model_state, cfg, cfg.fusion, xs,
            train=False, compute_dtype=compute_dtype,
        )
        loss = segmentation_loss(powerset, scores, target)
        m = der_metrics(powerset, scores, target)
        m["loss_sum"] = loss * xs.shape[0]
        m["num_chunks"] = jnp.asarray(xs.shape[0], jnp.float32)
        return m

    return eval_step


def make_eval_step(cfg: EendConfig, compute_dtype=jnp.bfloat16) -> Callable:
    """Returns eval_step(state, batch) -> metrics with loss + DER components
    (summed over the batch; accumulate across batches then divide)."""
    powerset = cfg.powerset
    fwd = segmentation_forward(cfg)

    def eval_step(state: TrainState, batch: Dict):
        xs, target = decode_batch(batch)
        scores, _ = fwd(
            state.params, state.model_state, cfg, xs,
            train=False, compute_dtype=compute_dtype,
        )
        loss = segmentation_loss(powerset, scores, target)
        m = der_metrics(powerset, scores, target)
        m["loss_sum"] = loss * xs.shape[0]
        m["num_chunks"] = jnp.asarray(xs.shape[0], jnp.float32)
        return m

    return eval_step


def jit_train_step(train_step, mesh, params_shardings=None):
    """Compile a train step with batch sharded over the mesh 'data' axis and
    state sharded per `params_shardings` (replicated by default)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P("data"))

    def shard_like(tree, shardings):
        if shardings is None:
            return jax.tree_util.tree_map(lambda _: repl, tree)
        return shardings

    return jax.jit(
        train_step,
        in_shardings=(
            None,  # state: inferred from placement (replicated or TP)
            jax.tree_util.tree_map(lambda _: batch_shard, {"xs": 0, "target": 0}),
            repl,
        ),
        donate_argnums=(0,),
    )
