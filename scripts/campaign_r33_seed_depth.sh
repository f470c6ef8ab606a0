#!/bin/bash
# Campaign r33: seed-depth hardening at the SHIPPED presets, queued
# behind campaign r32.  The quality rows resting on the fewest fresh
# seeds at the shipped operating point:
#   - canonical_fast (bf16+scan20+remat/save_st): seeds 0/1 only -> add 2
#   - canonical_uniform at the shipped preset: uniform_v5 seed0 only
#     -> add seeds 1/2
# Each is ~5-12 min; all evidence committed by the session loop.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r33.log

while ! grep -q "campaign r32 done" runs/campaign_r32.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r33 start ($(date +%H:%M:%S)) ===" >> "$log"

train_eval () {  # workdir config eval_batch eval_batches extra-args...
  local wd="$1" cfg="$2" eb="$3" en="$4"; shift 4
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config "$cfg" \
    --workdir "$wd" "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --batch-size "$eb" --batches "$en" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

train_eval runs/cfv5_seed2     canonical_fast    1024 16 --train-set "seed=2"
train_eval runs/uniform_v5_s1  canonical_uniform 1024 16 --train-set "seed=1"
train_eval runs/uniform_v5_s2  canonical_uniform 1024 16 --train-set "seed=2"

echo "=== campaign r33 done ($(date +%H:%M:%S)) ===" >> "$log"
