#!/bin/bash
# Campaign r43 (round 5): keep-best-on-exhaustion re-runs + u28 best-ckpt.
#   1. Literal-regime seeds that exhausted 10 restarts in campaign r40
#      under the old keep-LAST policy (finals 0.668-0.890 despite
#      0.9375-0.9492 best draws): re-run under keep-best (the loop now
#      replays the best attempt's seed on exhaustion).  Fresh workdirs
#      (canonical_det2_*) so the r40 evidence stays intact.
#   2. u28v6 best-checkpoint evals: the late 2->1 merge drift forms
#      after the 10k gate (0.992@10k -> 0.9897@150k on seed0); the
#      best-eval checkpoint the tracker retains is the serving artifact
#      for counting (BASELINE.md u28v2 precedent).
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r43.log

while ! grep -q "campaign r42 done" runs/campaign_r42.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r43 start ($(date +%H:%M:%S)) ===" >> "$log"

for s in 3 4 5 6 7 8; do
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

for s in 0 1 2; do
  out="runs/u28v6_seed${s}_eval_best.log"
  if [ -s "$out" ] && grep -q '"count_accuracy"' "$out"; then
    echo "=== $out already complete, skipping ===" >> "$log"; continue
  fi
  echo "=== u28v6_seed$s best-ckpt eval ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical_uniform28 \
    --workdir "runs/u28v6_seed$s" --batch-size 1024 --batches 16 --best \
    > "$out" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "$out" | tail -1 >> "$log"
done

echo "=== campaign r43 done ($(date +%H:%M:%S)) ===" >> "$log"
