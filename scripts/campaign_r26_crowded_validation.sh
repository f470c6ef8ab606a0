#!/bin/bash
# Campaign r26: validate the r4 shipped crowded procedure on FRESH seeds.
#
# The crowded preset now ships (round 4):
#   - scan_steps=20            (bit-exact dispatch amortizer)
#   - two-phase max_scale cap  (uncapped 30k bootstrap -> cap 0.30;
#                               rescued seed4 0.672->0.9955, campaign r25)
#   - early-basin detect-and-restart (basin_detect_step=10k, mode-acc
#     gate 0.95, <=5 restarts; targets the seed2-type frozen basin that
#     is schedule- AND geometry-insensitive)
#
# VERDICT r3 next #1 done criterion: >=4/5 FRESH seeds >=0.99 held-out at
# the shipped preset(+detector), eval logs committed.  Seeds 10-14 are
# fresh (never probed); seed 2 is appended as the known-frozen control —
# the detector must fire on it and the restarted attempt should land a
# good basin.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r26.log

# wait for any in-flight bench to release the TPU
for _ in $(seq 360); do
  pgrep -f "bench.py" > /dev/null 2>&1 || break
  sleep 10
done
echo "=== campaign r26 start ($(date +%H:%M:%S)) ===" >> "$log"

run_seed () {  # seed
  local seed="$1" wd="runs/crowded_v2_seed$1"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd @150000 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 10800 python scripts/run_variant.py --config crowded \
    --workdir "$wd" --train-set "seed=$seed" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 32 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

for s in 10 11 12 13 14 2; do
  run_seed "$s"
done

echo "=== campaign r26 done ($(date +%H:%M:%S)) ===" >> "$log"
