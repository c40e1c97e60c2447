from diarizen_tpu.train.loss import der_metrics, segmentation_loss
from diarizen_tpu.train.optim import (
    adamw_with_warmup,
    auto_clip_by_percentile,
    dual_lr_optimizer,
    warmup_schedule,
)
from diarizen_tpu.train.step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "der_metrics", "segmentation_loss",
    "adamw_with_warmup", "auto_clip_by_percentile", "dual_lr_optimizer",
    "warmup_schedule", "TrainState", "create_train_state",
    "make_eval_step", "make_train_step",
]
