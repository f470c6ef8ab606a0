#!/bin/bash
# Campaign r25: two-phase max_scale cap on the crowded preset's bad seeds.
#
# Finding so far (campaigns r18/r19/r21): the gentle 100k anneal reduces
# but does not eliminate basin fragility — seed2 lands in the SAME merge
# basin under both schedules (0.8442 @40k-anneal, 0.845 @100k-anneal),
# i.e. basin selection happens early and is schedule-insensitive for
# some seeds.  The u28 lesson was to make the merge UNREPRESENTABLE.
# On crowded the capacity knob (n_what=20) does not transfer (0.8495),
# but the geometry knob can: digits are 16 px on 100 px (scale 0.16), so
# a merged window spanning two digits needs scale >= ~0.32, while
# max_scale=0.30 still allows a generous ~2x single-digit window.  A cap
# from step 0 collapses on sparse canvases (E[n]->0, runs/crowded_r2:
# capped exploratory windows never find ink), hence TWO PHASES:
#   phase A (0-30k):   preset verbatim, uncapped — bootstrap oversized
#                      windows grab ink, E[n] establishes;
#   phase B (30k-150k): resume same workdir with max_scale=0.30 — the
#                      merge optimum becomes unrepresentable, likelihood
#                      must split the merged windows.
# Probes the reliably-bad seed 2, and seed 4 if its r21 gentle-anneal
# eval also failed (<0.95).
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r25.log

for _ in $(seq 1440); do
  grep -q "campaign r24 done" runs/campaign_r24.log 2>/dev/null && break
  sleep 10
done
echo "=== campaign r25 start ($(date +%H:%M:%S)) ===" >> "$log"

run_2phase () {  # seed
  local seed="$1" wd="runs/crowded_cap2p_seed$1"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd phase A @30000 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config crowded \
    --workdir "$wd" --iters 30000 --train-set "seed=$seed" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  echo "=== $wd phase B (cap 0.30) @150000 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config crowded \
    --workdir "$wd" --iters 150000 --train-set "seed=$seed" \
    --model-set "max_scale=0.30" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 16 \
    --model-set "max_scale=0.30" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
}

run_2phase 2

acc=$(grep -o '"count_accuracy_mode": [0-9.]*' runs/crowded_ship_seed4_eval.log 2>/dev/null \
      | tail -1 | grep -o '[0-9.]*$')
if [ -n "$acc" ] && python3 -c "import sys; sys.exit(0 if float('$acc') < 0.95 else 1)"; then
  run_2phase 4
else
  echo "(seed4 gentle-anneal eval ${acc:-missing} >= 0.95 or absent — skipping)" >> "$log"
fi

echo "=== campaign r25 done ($(date +%H:%M:%S)) ===" >> "$log"
