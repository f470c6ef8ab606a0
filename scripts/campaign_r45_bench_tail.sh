#!/bin/bash
# Campaign r45 (round 5): bench tail, queued behind r44.
# (r44 was edited after launch; bash had buffered the original text, so
# the canvas/scan100 probes moved here.)
#   1. bf16-carry-ALONE canvas probe (r42 rejected rebuild; this is the
#      last canvas-byte arm).
#   2. scan100 steady-state re-probe (compile cliff resolved: ~10s
#      compiles at every K — does K=100 actually beat K=50?).
#   3. Once-per-round full operating-point sweep (headline honesty).
#   4. Two clean headline benches at the shipped preset for the round
#      record.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r45.log

while ! grep -q "campaign r44 done" runs/campaign_r44.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r45 start ($(date +%H:%M:%S)) ===" >> "$log"

echo "=== canvas bench bf16-carry-only ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1200 python bench.py --config canonical_fast \
  --model-set "canvas_carry_dtype='bfloat16'" \
  > runs/bench_canvas_bf16carry.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_canvas_bf16carry.log | head -1 >> "$log"

echo "=== bench scan100 re-probe ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python bench.py --config canonical_fast --scan-steps 100 \
  > runs/bench_scan100_r44.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_scan100_r44.log | head -1 >> "$log"

echo "=== full sweep ($(date +%H:%M:%S)) ===" >> "$log"
timeout 3600 python bench.py --sweep > runs/bench_sweep_r45.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
tail -2 runs/bench_sweep_r45.log >> "$log"

for i in 1 2; do
  echo "=== headline bench $i ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 1200 python bench.py > "runs/bench_headline_r45_$i.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"value": [0-9.]*' "runs/bench_headline_r45_$i.log" | head -1 >> "$log"
done

echo "=== campaign r45 done ($(date +%H:%M:%S)) ===" >> "$log"
