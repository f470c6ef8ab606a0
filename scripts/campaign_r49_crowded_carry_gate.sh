#!/bin/bash
# Campaign r49 (round 5): quality gate for bf16 canvas carry on crowded.
# Bench probe read 183.6k vs 153.1k preset-verbatim (+19.9% — crowded is
# f32/no-remat, so the five per-step (B,100,100) canvas saves are the
# dominant activation bytes and the carry dtype halves them).  Crowded
# is the build's most numerics-fragile task (the bf16 COMPUTE gate
# stands), so the carry ships only on 3/3 fresh seeds ≥0.999 at the
# prevention preset + carry override.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r49.log

while ! grep -q "campaign r48 done" runs/campaign_r48.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r49 start ($(date +%H:%M:%S)) ===" >> "$log"

for s in 40 41 42; do
  wd="runs/crowded_carry_seed$s"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; continue
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 10800 python scripts/run_variant.py --config crowded \
    --workdir "$wd" --train-set "seed=$s" \
    --model-set "canvas_carry_dtype='bfloat16'" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 32 \
    --model-set "canvas_carry_dtype='bfloat16'" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
  grep -o '"elbo": [0-9.]*' "${wd}_eval.log" | head -1 >> "$log"
done

echo "=== campaign r49 done ($(date +%H:%M:%S)) ===" >> "$log"
