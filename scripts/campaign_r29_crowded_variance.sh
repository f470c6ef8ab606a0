#!/bin/bash
# Campaign r29 (CONTINGENCY — launch only if r26 lands <4/5 or TPU time
# remains): the two untried variance levers on the crowded merge basin
# (VERDICT r3 weak #1).  Bad-basin selection happens in the high-variance
# early phase at half the canonical batch; REINFORCE variance ~ 1/B.
#
#   a) batch 1024 (+ sqrt-scaled lr) on the known-frozen seed2
#   b) advantage_norm=True (NVIL variance normalization) on seed2
#
# Each probe runs WITHOUT the basin detector (basin_detect_step=0) so the
# lever's own effect is measured, not the detector's.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r29.log

# chain after campaign r27 (one TPU process at a time)
for _ in $(seq 4320); do
  grep -q "campaign r27 done" runs/campaign_r27.log 2>/dev/null && break
  sleep 10
done
echo "=== campaign r29 start ($(date +%H:%M:%S)) ===" >> "$log"

probe () {  # name extra-args...
  local name="$1" wd="runs/crowded_var_$1"; shift
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd @150000 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 10800 python scripts/run_variant.py --config crowded \
    --workdir "$wd" --train-set "seed=2" --train-set "basin_detect_step=0" \
    "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 32 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

probe b1024_s2 --train-set "batch_size=1024" --train-set "learning_rate=1.4e-4"
probe advnorm_s2 --train-set "advantage_norm=True"

echo "=== campaign r29 done ($(date +%H:%M:%S)) ===" >> "$log"
