#!/bin/bash
# Campaign r40 (round 5): point the basin detect-and-restart procedure at
# the LITERAL reference regime (VERDICT r5 missing #2 / next #2).
#
# Calibration (from the committed n=10 literal distribution):
#   10k-step held-out mode accuracy separates the bands cleanly —
#   the one good seed (seed3, final 0.9456) read 0.969 at 10k; every
#   other seed read 0.719-0.875 at 10k and finished 0.831-0.892.
#   Threshold 0.95 sits in the empty gap between the bands.
#
# Design: PAIRED with the known distribution — the same seeds 2..9 whose
# detector-off finals are committed (runs/canonical_ref150k_seed*).  A
# fresh basin reads >=0.95 at 10k with p~0.1 (1/10 observed), so
# max_restarts=10 gives each seed ~2/3 odds of landing a good basin;
# restarts are cheap here (10k steps ~ 12 s).  Outcomes:
#   - distribution lifts toward the 0.946 tail => the paper's high-90s
#     reads as a basin lottery the reference won;
#   - restarts land in the same ~0.89 band => strongest evidence yet for
#     the model-class-ceiling claim.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r40.log

while ! grep -q "campaign r39 done" runs/campaign_r39.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r40 start ($(date +%H:%M:%S)) ===" >> "$log"

for s in 2 3 4 5 6 7 8 9; do
  wd="runs/canonical_det_seed$s"
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
  timeout 2400 python scripts/eval_checkpoint.py --config canonical \
    --workdir "$wd" --batch-size 1024 --batches 16 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
done

echo "=== campaign r40 done ($(date +%H:%M:%S)) ===" >> "$log"
