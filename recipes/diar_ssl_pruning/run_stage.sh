#!/usr/bin/env bash
# Pruning stage driver (parity with reference
# recipes/diar_ssl_pruning/run_stage.sh):
#   stage 1: joint distill+prune training, then apply pruning surgery on the
#            averaged post-loss-peak checkpoints;
#   stage 2: further-distill the pruned student (masks frozen off);
#   stage 3: continued diarization training on the pruned WavLM
#            (recipes/diar_ssl with wavlm_src pointed at the pruned ckpt).
set -euo pipefail

stage=${1:-1}
conf=${CONF:-conf/s80_base.toml}
conf_name=$(basename "$conf" .toml)
exp_root=${EXP_ROOT:-exp}
exp_dir=$exp_root/$conf_name
avg_ckpt_num=${AVG_CKPT_NUM:-5}

if [ "$stage" -le 1 ]; then
  echo "=== stage 1a: distillation + pruning training ==="
  python run_distill_prune.py -C "$conf"

  echo "=== stage 1b: pruning surgery (avg ${avg_ckpt_num} post-peak ckpts) ==="
  python apply_pruning.py -C "$conf" --out_dir "$exp_dir/pruned" \
    --avg_ckpt_num "$avg_ckpt_num"
fi

if [ "$stage" -le 2 ]; then
  echo "=== stage 2: further distillation of the pruned student ==="
  python run_distill_prune.py -C "$conf" --further_distill
fi

if [ "$stage" -le 3 ]; then
  echo "=== stage 3: continued diarization training on the pruned WavLM ==="
  echo "point recipes/diar_ssl conf [model.args] wavlm_src at" \
    "$exp_dir/pruned (config.json + params.npz) and run" \
    "recipes/diar_ssl/run_stage.sh 1"
fi
