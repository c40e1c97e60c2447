"""Epoch-driven trainer for EEND segmentation models.

Capability parity with the reference Accelerate trainers
(diarizen/trainer_dual_opt.py:38-661 / trainer_single_opt.py): experiment-dir
layout, per-epoch checkpoint save + keep-latest-N GC, warmup schedulers,
training loop with NaN-batch skip and percentile auto-clip (both inside the
compiled step, train/step.py), validation loop accumulating DER components,
early stopping with patience, TensorBoard + structured JSONL metrics, resume
from the latest checkpoint.

TPU-native replacements for the Accelerate machinery:
  * DDP -> jit with batch sharded over the mesh 'data' axis (gradient
    all-reduce inserted by XLA; SURVEY.md section 2.5);
  * `gather_for_metrics` -> DER component sums come out of the jit step
    already globally reduced (they are computed on replicated outputs);
  * rank-consensus early stop -> single-controller jax: the Python loop IS
    rank 0; no consensus protocol needed.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diarizen_tpu.models.eend import EendConfig
from diarizen_tpu.train.checkpoint import (
    append_metrics,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from diarizen_tpu.train.step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

logger = logging.getLogger("diarizen_tpu.trainer")


@dataclass
class TrainerConfig:
    exp_dir: str = "exp/default"
    max_epochs: int = 100
    patience: int = 10  # early stop after N non-improving epochs
    monitor: str = "loss"  # "loss" | "der"
    max_num_checkpoints: int = 100
    compute_dtype: str = "bfloat16"
    log_every: int = 50
    seed: int = 3407
    validation_interval: int = 1  # validate every N epochs (reference option)
    monitor_mode: str = "min"  # "min" | "max" (reference save_max_score)


class Trainer:
    def __init__(
        self,
        cfg: EendConfig,
        trainer_cfg: TrainerConfig,
        optimizer: optax.GradientTransformation,
        params,
        model_state,
        mesh=None,
        train_step_fn=None,
        eval_step_fn=None,
        channel_sampler=None,
    ):
        """`train_step_fn`/`eval_step_fn` override the default single-channel
        steps (e.g. the MC steps from train/step.py). When `channel_sampler`
        is given (callable -> int), the train step takes a 4th STATIC
        `num_channels` argument drawn per step — the reference MC model's
        random channel truncation (model_wavlm_conformer_mc.py:262-265)."""
        self.cfg = cfg
        self.tc = trainer_cfg
        self.optimizer = optimizer
        self.mesh = mesh
        self.channel_sampler = channel_sampler
        self.exp_dir = Path(trainer_cfg.exp_dir)
        self.ckpt_root = self.exp_dir / "checkpoints"
        self.exp_dir.mkdir(parents=True, exist_ok=True)

        compute_dtype = jnp.bfloat16 if trainer_cfg.compute_dtype == "bfloat16" else jnp.float32
        if train_step_fn is None:
            train_step_fn = make_train_step(cfg, optimizer, compute_dtype=compute_dtype)
        if eval_step_fn is None:
            eval_step_fn = make_eval_step(cfg, compute_dtype=compute_dtype)
        static = (3,) if channel_sampler is not None else ()
        self._train_step = jax.jit(
            train_step_fn, donate_argnums=(0,), static_argnums=static
        )
        self._eval_step = jax.jit(eval_step_fn)

        self.state = create_train_state(params, model_state, optimizer)
        self.start_epoch = 0
        self.best_score = float("inf")
        self.best_epoch = -1
        self.epochs_without_improvement = 0

        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(str(self.exp_dir / "tb"))
        except Exception:  # tensorboard optional
            self.tb = None

    # ------------------------------------------------------------------ utils

    def _shard_batch(self, batch: Dict) -> Dict:
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if self.mesh is None:
            return arrays
        from diarizen_tpu.parallel.mesh import shard_batch

        return shard_batch(arrays, self.mesh)

    def _log_scalar(self, name: str, value: float, step: int) -> None:
        if self.tb is not None:
            self.tb.add_scalar(name, value, step)

    # ----------------------------------------------------------------- resume

    def resume(self) -> bool:
        ckpt = latest_checkpoint(self.ckpt_root)
        if ckpt is None:
            return False
        params, model_state, opt_leaves, meta = load_checkpoint(ckpt)
        if opt_leaves is None:
            opt_state = self.optimizer.init(params)
        else:
            # rebuild the optax state structure (NamedTuples/EmptyState do not
            # survive npz) from the ordered leaves
            template = jax.eval_shape(lambda p: self.optimizer.init(p), params)
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(template), opt_leaves
            )
        self.state = TrainState(
            params=params,
            model_state=model_state,
            opt_state=opt_state,
            step=jnp.asarray(meta.get("step", 0), jnp.int32),
        )
        self.start_epoch = meta["epoch"] + 1
        self.best_score = meta.get("best_score", float("inf"))
        self.best_epoch = meta.get("best_epoch", -1)
        self.epochs_without_improvement = meta.get("epochs_without_improvement", 0)
        logger.info("resumed from %s (epoch %d)", ckpt, self.start_epoch)
        return True

    # ------------------------------------------------------------------ train

    def train_epoch(self, loader, epoch: int, rng: jax.Array) -> Dict[str, float]:
        # Device-side accumulators updated EVERY step (the reference averages
        # every batch too, trainer_dual_opt.py loss bookkeeping); the adds are
        # dispatched asynchronously, so the host never blocks on them — one
        # sync at epoch end. Skipped (NaN) batches are excluded from the mean
        # but counted exactly.
        acc_loss = jnp.zeros(())
        acc_gn = jnp.zeros(())
        acc_good = jnp.zeros((), jnp.int32)
        acc_skip = jnp.zeros((), jnp.int32)
        t0 = time.time()
        n = 0
        # steps trace under the exact-f32 flash softmax so validation
        # forwards share the training objective's numerics (checkpoint
        # selection must not depend on the inference-only deferred
        # schedule); the scope restores the process default on exit
        from diarizen_tpu.ops.flash_attention import softmax_mode_scope

        for i, batch in enumerate(loader):
            sharded = self._shard_batch(batch)
            with softmax_mode_scope("f32"):
                if self.channel_sampler is not None:
                    k = int(self.channel_sampler())
                    self.state, metrics = self._train_step(self.state, sharded, rng, k)
                else:
                    self.state, metrics = self._train_step(self.state, sharded, rng)
            n += 1
            bad = metrics["skipped"]
            acc_loss = acc_loss + jnp.where(bad, 0.0, metrics["loss"])
            acc_gn = acc_gn + jnp.where(bad, 0.0, metrics["grad_norm"])
            acc_good = acc_good + jnp.where(bad, 0, 1)
            acc_skip = acc_skip + jnp.where(bad, 1, 0)
            if (i + 1) % self.tc.log_every == 0:
                loss = float(metrics["loss"])
                gn = float(metrics["grad_norm"])
                step = int(self.state.step)
                self._log_scalar("train/loss", loss, step)
                self._log_scalar("train/grad_norm", gn, step)
                logger.info(
                    "epoch %d step %d loss %.4f grad_norm %.3f", epoch, step, loss, gn
                )
        dt = time.time() - t0
        good = max(int(acc_good), 1)
        return {
            "train_loss": float(acc_loss) / good if n else float("nan"),
            "train_grad_norm": float(acc_gn) / good if n else float("nan"),
            "skipped_batches": int(acc_skip),
            "train_batches": n,
            "epoch_seconds": dt,
        }

    def validate(self, loader) -> Dict[str, float]:
        # Accumulate on device: each batch's adds are dispatched async, so the
        # host never blocks mid-epoch; one device_get at the end is the only
        # sync (the reference host-syncs per batch via gather_for_metrics,
        # trainer_dual_opt.py:555-558 — here that would cost a tunnel RTT per
        # batch).
        from diarizen_tpu.ops.flash_attention import softmax_mode_scope

        keys = ("false_alarm", "missed_detection", "confusion",
                "speech_total", "loss_sum", "num_chunks")
        acc = {k: jnp.zeros(()) for k in keys}
        for batch in loader:
            with softmax_mode_scope("f32"):  # see train_epoch
                m = self._eval_step(self.state, self._shard_batch(batch))
            for k in keys:
                acc[k] = acc[k] + m[k]
        totals = {k: float(v) for k, v in jax.device_get(acc).items()}
        speech = max(totals["speech_total"], 1e-9)
        der = (totals["false_alarm"] + totals["missed_detection"] + totals["confusion"]) / speech
        return {
            "loss": totals["loss_sum"] / max(totals["num_chunks"], 1.0),
            "der": der,
            "false_alarm": totals["false_alarm"] / speech,
            "missed_detection": totals["missed_detection"] / speech,
            "confusion": totals["confusion"] / speech,
        }

    def train(self, train_loader, val_loader) -> Dict[str, float]:
        rng = jax.random.PRNGKey(self.tc.seed)
        last_val: Dict[str, float] = {}
        for epoch in range(self.start_epoch, self.tc.max_epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            train_metrics = self.train_epoch(train_loader, epoch, rng)
            if (epoch + 1) % self.tc.validation_interval != 0:
                # Save every epoch even without validation (the reference
                # checkpoints unconditionally, trainer_dual_opt.py:488-489) —
                # a crash mid-interval must not lose epochs.
                step = int(self.state.step)
                append_metrics(self.exp_dir, {"epoch": epoch, **train_metrics,
                                              "step": step})
                save_checkpoint(
                    self.ckpt_root, epoch,
                    self.state.params, self.state.model_state, self.state.opt_state,
                    meta={
                        "step": step,
                        "best_score": self.best_score,
                        "best_epoch": self.best_epoch,
                        "epochs_without_improvement": self.epochs_without_improvement,
                    },
                    max_keep=self.tc.max_num_checkpoints,
                    protect={self.best_epoch} if self.best_epoch >= 0 else None,
                )
                continue
            val_metrics = self.validate(val_loader)
            last_val = val_metrics
            logger.info(
                "Validation Loss/DER on epoch %d: %.4f / %.4f",
                epoch, val_metrics["loss"], val_metrics["der"],
            )
            step = int(self.state.step)
            for k, v in val_metrics.items():
                self._log_scalar(f"val/{k}", v, step)

            score = val_metrics[self.tc.monitor]
            if self.tc.monitor_mode == "max":
                score = -score
            improved = score < self.best_score
            if improved:
                self.best_score = score
                self.best_epoch = epoch
                self.epochs_without_improvement = 0
            else:
                self.epochs_without_improvement += 1

            append_metrics(
                self.exp_dir,
                {"epoch": epoch, **train_metrics, **val_metrics,
                 "best": improved, "step": step},
            )
            save_checkpoint(
                self.ckpt_root, epoch,
                self.state.params, self.state.model_state, self.state.opt_state,
                meta={
                    "step": step,
                    "best_score": self.best_score,
                    "best_epoch": self.best_epoch,
                    "epochs_without_improvement": self.epochs_without_improvement,
                    **val_metrics,
                },
                max_keep=self.tc.max_num_checkpoints,
                protect={self.best_epoch} if self.best_epoch >= 0 else None,
            )

            if self.epochs_without_improvement >= self.tc.patience:
                logger.info(
                    "early stop at epoch %d (no %s improvement for %d epochs)",
                    epoch, self.tc.monitor, self.tc.patience,
                )
                break
        return last_val
