#!/usr/bin/env bash
# Multi-channel stage driver (parity with reference
# recipes/diar_ssl_mc/run_stage.sh): stage 1 trains the ChAtt fusion model,
# stage 2 runs checkpoint-averaged inference with per-channel embeddings +
# attention-weighted fusion, stage 3 reports DER (built into infer.py).
set -euo pipefail

stage=${1:-1}
conf=${CONF:-conf/wavlm_mc_chatt.toml}
exp_dir=${EXP_DIR:-exp/$(basename "$conf" .toml)}
test_sets=${TEST_SETS:-"AMI AISHELL4 AliMeeting CHiME7 NOTSOFAR1"}
num_channels=${NUM_CHANNELS:-8}
embedding_ckpt=${EMBEDDING_CKPT:-}

if [ "$stage" -le 1 ]; then
  echo "=== stage 1: MC training ==="
  python run.py -C "$conf" -M train
fi

if [ "$stage" -le 2 ]; then
  echo "=== stage 2+3: MC inference (att-weighted fusion) + scoring ==="
  for ts in $test_sets; do
    extra=""
    [ -n "$embedding_ckpt" ] && extra="--embedding_ckpt $embedding_ckpt"
    python infer.py -C "$conf" --exp_dir "$exp_dir" \
      --wav_scp "data/$ts/test/wav.scp" --ref_rttm "data/$ts/test/rttm" \
      --out_dir "$exp_dir/infer/$ts" --num_channels "$num_channels" \
      --avg_ckpt_num 5 --avg_mode best $extra
    echo "--- $ts DER ---"
    python -c "import json; print(json.dumps({k:v for k,v in json.load(open('$exp_dir/infer/$ts/der.json')).items() if k!='files'}, indent=2))"
  done
fi
