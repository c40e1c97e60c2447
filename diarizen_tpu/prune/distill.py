"""Joint distillation + structured-pruning training step.

Capability parity with the reference pipeline (models/pruning/
model_distill_prune.py + models/pruning/utils.py + recipes/diar_ssl_pruning/
trainer_distill_prune.py:43-110):
  * frozen teacher and gated student share the WavLM init; the student
    samples HardConcrete masks every step;
  * distill loss = weighted L2 / L1 / cosine over hidden states at
    `distill_layers` (default 0, 4, 8, 12), stacked (B, layer, T, D);
  * Lagrangian sparsity objective lambda1 (s - t) + lambda2 (s - t)^2 with
    target sparsity warmed linearly over `sparsity_warmup_updates` after
    `pre_train_updates`; lambda1/2 trained with NEGATIVE learning rate
    (gradient ascent -> saddle point, utils.py:67-101);
  * three optimizer groups: main 2e-4 | log_alpha 2e-2 | lambda -2e-2.

All of it lives inside ONE jit-able step — the sparsity schedule is computed
from the step counter on device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from diarizen_tpu.models.wavlm import WavLMConfig, wavlm_extract_features
from diarizen_tpu.prune.gates import expected_num_params, sample_gates
from diarizen_tpu.train.step import fast_dropout_rng


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    l2_weight: float = 0.0
    l1_weight: float = 1.0
    cos_weight: float = 1.0
    cos_type: str = "raw"  # "raw" | "log_sig"
    distill_layers: Tuple[int, ...] = (0, 4, 8, 12)
    target_sparsity: float = 0.8
    pre_train_updates: int = 0
    sparsity_warmup_updates: int = 1
    distill_lr: float = 2e-4
    reg_lr: float = 2e-2
    use_reg: bool = True


def distill_loss(
    cfg: DistillConfig, student: jnp.ndarray, teacher: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(B, L, T, D) stacked hidden states (models/pruning/utils.py:42-65)."""
    student = student.astype(jnp.float32)
    teacher = teacher.astype(jnp.float32)
    loss_mse = jnp.mean((student - teacher) ** 2) if cfg.l2_weight else 0.0
    loss_l1 = jnp.mean(jnp.abs(student - teacher)) if cfg.l1_weight else 0.0
    loss_cos = 0.0
    if cfg.cos_weight:
        sim = jnp.sum(student * teacher, -1) / (
            jnp.linalg.norm(student, axis=-1) * jnp.linalg.norm(teacher, axis=-1) + 1e-8
        )
        if cfg.cos_type == "raw":
            loss_cos = -jnp.mean(sim)
        else:
            loss_cos = -jnp.mean(jnp.log(jax.nn.sigmoid(sim)))
    loss = cfg.l2_weight * loss_mse + cfg.l1_weight * loss_l1 + cfg.cos_weight * loss_cos
    return loss, {"loss_mse": loss_mse, "loss_l1": loss_l1, "loss_cos": loss_cos}


class DistillPruneState(NamedTuple):
    student: Any  # wavlm params (trainable)
    log_alphas: Any  # gate params (trainable)
    lambdas: jnp.ndarray  # (2,) Lagrangian multipliers (gradient ASCENT)
    opt_state: Any
    step: jnp.ndarray


def make_distill_prune_optimizer(cfg: DistillConfig) -> optax.GradientTransformation:
    """Three-group optimizer as one multi_transform over the
    {'student','log_alphas','lambdas'} pytree (utils.py:67-101)."""
    return optax.multi_transform(
        {
            "main": optax.adamw(cfg.distill_lr, weight_decay=0.0),
            "log_alpha": optax.adamw(cfg.reg_lr, weight_decay=0.0),
            "lambda": optax.adamw(-cfg.reg_lr, weight_decay=0.0),
        },
        lambda params: {
            "student": jax.tree_util.tree_map(lambda _: "main", params["student"]),
            "log_alphas": jax.tree_util.tree_map(lambda _: "log_alpha", params["log_alphas"]),
            "lambdas": "lambda",
        },
    )


def create_distill_prune_state(
    student_params, log_alphas, optimizer
) -> DistillPruneState:
    trainable = {"student": student_params, "log_alphas": log_alphas,
                 "lambdas": jnp.zeros((2,))}
    return DistillPruneState(
        student=student_params,
        log_alphas=log_alphas,
        lambdas=jnp.zeros((2,)),
        opt_state=optimizer.init(trainable),
        step=jnp.zeros((), jnp.int32),
    )


def make_distill_prune_step(
    wavlm_cfg: WavLMConfig,
    dcfg: DistillConfig,
    teacher_params,
    optimizer: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
):
    """Returns step(state, waveforms (B, T), rng) -> (state, metrics)."""
    teacher_total = None  # computed lazily below (static)

    import numpy as np

    teacher_total = float(
        sum(np.prod(np.asarray(p).shape) for p in jax.tree_util.tree_leaves(teacher_params))
    )

    def target_sparsity(step):
        real = jnp.maximum(step - dcfg.pre_train_updates, 0)
        frac = jnp.minimum(1.0, real / max(dcfg.sparsity_warmup_updates, 1))
        return dcfg.target_sparsity * frac

    def step_fn(state: DistillPruneState, waveforms: jnp.ndarray, rng: jax.Array):
        step_rng = fast_dropout_rng(jax.random.fold_in(rng, state.step))

        # teacher forward (frozen, no masks)
        teacher_hidden = wavlm_extract_features(
            teacher_params, wavlm_cfg, waveforms, train=False, compute_dtype=compute_dtype
        )
        teacher_stack = jnp.stack(
            [teacher_hidden[i] for i in dcfg.distill_layers], axis=1
        )  # (B, L, T, D)

        def loss_fn(trainable):
            gates = sample_gates(trainable["log_alphas"], step_rng)
            student_hidden = wavlm_extract_features(
                trainable["student"], wavlm_cfg, waveforms,
                train=True, rng=None, compute_dtype=compute_dtype, gates=gates,
            )
            student_stack = jnp.stack(
                [student_hidden[i] for i in dcfg.distill_layers], axis=1
            )
            l_distill, parts = distill_loss(dcfg, student_stack, teacher_stack)

            if dcfg.use_reg:
                cur = 1.0 - expected_num_params(wavlm_cfg, trainable["log_alphas"]) / teacher_total
                tgt = target_sparsity(state.step)
                gap = cur - tgt
                l_reg = trainable["lambdas"][0] * gap + trainable["lambdas"][1] * gap**2
            else:
                cur = jnp.asarray(0.0)
                tgt = jnp.asarray(0.0)
                l_reg = jnp.asarray(0.0)
            loss = l_distill + l_reg
            aux = {**parts, "loss_distill": l_distill, "loss_reg": l_reg,
                   "sparsity_expected": cur, "sparsity_target": tgt}
            return loss, aux

        trainable = {"student": state.student, "log_alphas": state.log_alphas,
                     "lambdas": state.lambdas}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)

        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads)
        updates, new_opt = optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(good, a, b), new, old
        )
        new_state = DistillPruneState(
            student=keep(new_trainable["student"], state.student),
            log_alphas=keep(new_trainable["log_alphas"], state.log_alphas),
            lambdas=keep(new_trainable["lambdas"], state.lambdas),
            opt_state=keep(new_opt, state.opt_state),
            step=state.step + 1,
        )
        metrics = {"loss": loss, **aux, "lambda1": state.lambdas[0],
                   "lambda2": state.lambdas[1], "skipped": ~good}
        return new_state, metrics

    return step_fn


def distill_loss_fn(l2_weight, l1_weight, cos_weight, cos_type):
    """Config-system entry matching the reference DistillLoss constructor
    (models/pruning/utils.py:17-29; aliased from
    `diarizen.models.pruning.utils.DistillLoss` in config.resolve). Returns
    `loss(student, teacher) -> (loss, parts)` closing over the weights."""
    assert cos_type in ("raw", "log_sig"), cos_type
    cfg = DistillConfig(
        l2_weight=l2_weight, l1_weight=l1_weight,
        cos_weight=cos_weight, cos_type=cos_type,
    )

    def loss(student, teacher):
        return distill_loss(cfg, student, teacher)

    return loss
