#!/bin/bash
# Campaign r50 (round 5): literal-regime basin-search depth — 4 FRESH
# seeds (not in the paired 2-9 set) under the finished keep-best
# procedure, extending the ceiling evidence from 84 to ~128 independent
# basin draws.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r50.log

while ! grep -q "campaign r49 done" runs/campaign_r49.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r50 start ($(date +%H:%M:%S)) ===" >> "$log"

for s in 10 11 12 13; do
  wd="runs/canonical_det2_seed$s"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; continue
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 3600 python scripts/run_variant.py --config canonical \
    --workdir "$wd" --iters 150000 \
    --train-set "seed=$s" \
    --train-set "basin_detect_step=10000" \
    --train-set "basin_accuracy_threshold=0.95" \
    --train-set "basin_max_restarts=10" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" "${wd}.log" | xargs -I{} echo "restarts fired: {}" >> "$log"
  grep "replaying best attempt" "${wd}.log" | tail -1 >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical \
    --workdir "$wd" --batch-size 1024 --batches 16 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
done

echo "=== campaign r50 done ($(date +%H:%M:%S)) ===" >> "$log"
