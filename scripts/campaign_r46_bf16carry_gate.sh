#!/bin/bash
# Campaign r46 (round 5): quality gate for the bf16 canvas carry, queued
# behind r45.
#   bench read 551.1k img/s vs same-session scan50 points ~503-519k
#   (runs/bench_canvas_bf16carry.log) — the one perf lever left.  But it
#   quantizes the reconstruction the likelihood reads (the exact
#   fragility class decoder_dtype='float32' exists for), so the gate is
#   3 full preset runs; ship only on 3/3 count accuracy ≥0.999 AND eval
#   ELBO within ~2 nats of the f32-carry rows (~2372).
#   Plus: bench the crowded preset verbatim after the prevention flip.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r46.log

while ! grep -q "campaign r45 done" runs/campaign_r45.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r46 start ($(date +%H:%M:%S)) ===" >> "$log"

echo "=== bench crowded preset verbatim (prevention flip) ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python bench.py --config crowded > runs/bench_crowded_r46.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_crowded_r46.log | head -1 >> "$log"

for s in 0 1 2; do
  wd="runs/cf_bf16carry_seed$s"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; continue
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config canonical_fast \
    --workdir "$wd" --train-set "seed=$s" \
    --model-set "canvas_carry_dtype='bfloat16'" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" "${wd}.log" | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical_fast \
    --workdir "$wd" --batch-size 1024 --batches 16 \
    --model-set "canvas_carry_dtype='bfloat16'" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
  grep -o '"elbo": [0-9.]*' "${wd}_eval.log" | head -1 >> "$log"
done

echo "=== campaign r46 done ($(date +%H:%M:%S)) ===" >> "$log"
