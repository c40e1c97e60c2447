#!/usr/bin/env bash
# Stage driver (parity with reference recipes/diar_ssl/run_stage.sh):
#   stage 1: train;  stage 2: checkpoint-averaged inference per test set;
#   stage 3: DER report (built into infer.py; no external dscore needed).
set -euo pipefail

stage=${1:-1}
conf=${CONF:-conf/wavlm_updated_conformer.toml}
exp_dir=${EXP_DIR:-exp/$(basename "$conf" .toml)}
test_sets=${TEST_SETS:-"AMI AliMeeting AISHELL4"}
embedding_ckpt=${EMBEDDING_CKPT:-}

if [ "$stage" -le 1 ]; then
  echo "=== stage 1: training ==="
  python run.py -C "$conf" -M train
fi

if [ "$stage" -le 2 ]; then
  echo "=== stage 2+3: inference + scoring ==="
  for ts in $test_sets; do
    extra=""
    [ -n "$embedding_ckpt" ] && extra="--embedding_ckpt $embedding_ckpt"
    python infer.py -C "$conf" --exp_dir "$exp_dir" \
      --wav_scp "data/$ts/test/wav.scp" --ref_rttm "data/$ts/test/rttm" \
      --out_dir "$exp_dir/infer/$ts" --avg_ckpt_num 5 --avg_mode best $extra
    echo "--- $ts DER ---"
    python -c "import json; print(json.dumps({k:v for k,v in json.load(open('$exp_dir/infer/$ts/der.json')).items() if k!='files'}, indent=2))"
  done
fi
