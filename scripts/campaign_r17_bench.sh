#!/bin/bash
# Campaign r17: serialized TPU bench queue, auto-started after campaign
# r16's evidence rebuild releases the chip.  All three items answer
# VERDICT r3 asks that need an otherwise-idle chip:
#   1. scripts/hbm_roofline.py   — measured (not modeled) HBM roofline:
#      STREAM-style practical peak + achieved step bandwidth + profiler
#      trace (VERDICT #5).
#   2. benchmarks.harness train_st — the tuned Pallas kernel grid
#      (method x block_b x dtype) vs the XLA separable baseline on the
#      real train path (VERDICT #4).
#   3. bench.py --sweep          — re-measure the full operating-point
#      grid so the headline cannot go stale (VERDICT #9), then one
#      verbatim headline run of the shipped preset.
cd /root/repo || exit 1

# Wait for campaign r16 to finish (it holds the chip).  Poll the log
# marker rather than a pid: survives this session and any respawn.
while ! grep -q "campaign r16 done" runs/campaign_r16.log 2>/dev/null; do
  sleep 60
done
echo "=== r16 done; starting bench queue ($(date +%H:%M:%S)) ==="

echo "--- 1. HBM roofline measurement ---"
timeout 3600 python scripts/hbm_roofline.py > runs/hbm_roofline_r3.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))"

echo "--- 2. Pallas train_st grid ---"
timeout 3600 python -m benchmarks.harness train_st \
  > runs/bench_train_st_r3.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))"

echo "--- 3. bench.py full sweep + verbatim headline ---"
timeout 5400 python bench.py --sweep > runs/bench_sweep_r3.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))"
timeout 1800 python bench.py > runs/bench_headline_r3.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))"

echo "=== campaign r17 done ($(date +%H:%M:%S)) ==="
