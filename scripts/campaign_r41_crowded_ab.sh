#!/bin/bash
# Campaign r41 (round 5): A/B the crowded *prevention* against the
# shipped *cure* (VERDICT r5 missing #3 / next #3).
#
# Cure (shipped preset): batch 512 + basin detect-and-restart — 6/6
# seeds >=0.9998 (runs/crowded_v2_*).
# Prevention (r30 probe, one seed): batch 1024 + lr*sqrt(2)=1.4e-4
# rescued the frozen seed2 basin outright (1.0000, detector OFF) —
# but nobody measured whether FRESH b1024 seeds avoid bad basins from
# the start.  3 fresh seeds, detector off; compare bad-basin incidence,
# wall-clock, img/s against the shipped procedure's record.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r41.log

while ! grep -q "campaign r40 done" runs/campaign_r40.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r41 start ($(date +%H:%M:%S)) ===" >> "$log"

for s in 30 31 32; do
  wd="runs/crowded_b1024_seed$s"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; continue
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 10800 python scripts/run_variant.py --config crowded \
    --workdir "$wd" \
    --train-set "seed=$s" \
    --train-set "batch_size=1024" \
    --train-set "learning_rate=1.4e-4" \
    --train-set "basin_detect_step=0" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 32 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
done

echo "=== campaign r41 done ($(date +%H:%M:%S)) ===" >> "$log"
