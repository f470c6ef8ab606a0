#!/bin/bash
# Campaign r38: round-4 close-out, queued behind r37.
#   1. u28v6_seed1 — second u28 seed at the HEAD preset (scan50 +
#      save_st + detector), so the HEAD refresh doesn't rest on one seed.
#   2. byte_map refresh at the scan50 operating point — keep the per-op
#      byte attribution current with the shipped program.
#   3. Two clean preset-verbatim headline benches on the then-idle chip
#      (the 08:02 control read 491.7k vs the sweep's 516.5k; take fresh
#      reads for the spread record).
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r38.log

while ! grep -q "campaign r37 done" runs/campaign_r37.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r38 start ($(date +%H:%M:%S)) ===" >> "$log"

if ! { [ -s runs/u28v6_seed1_eval.log ] && grep -q '"count_accuracy"' runs/u28v6_seed1_eval.log; }; then
  echo "=== runs/u28v6_seed1 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config canonical_uniform28 \
    --workdir runs/u28v6_seed1 --train-set "seed=1" \
    >> runs/u28v6_seed1.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" runs/u28v6_seed1.log | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical_uniform28 \
    --workdir runs/u28v6_seed1 --batch-size 1024 --batches 16 \
    > runs/u28v6_seed1_eval.log 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' runs/u28v6_seed1_eval.log | tail -1 >> "$log"
fi

echo "=== byte_map refresh at HEAD ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python scripts/byte_map.py --out runs/byte_map_r38.json \
  > runs/byte_map_r38.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

for i in 1 2; do
  echo "=== headline bench $i ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 1200 python bench.py > "runs/bench_headline_r38_$i.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"value": [0-9.]*' "runs/bench_headline_r38_$i.log" | head -1 >> "$log"
done

echo "=== campaign r38 done ($(date +%H:%M:%S)) ===" >> "$log"
