#!/bin/bash
# Campaign r24: fine-grained batch sweep around the headline operating
# point.  The r3 grid sweep (bench_sweep_r3.log) only probed batch
# {64,256,1024,2048} and found 1024 > 2048 at every dtype; r2 one-off
# probes saw batch 1536 beat 1024 pre-remat (343k vs 314k bf16).  This
# measures the SHIPPED canonical_fast step (bf16 + decoder_dtype=f32 +
# scan20 + remat, preset verbatim except batch) at intermediate batches.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r24.log

for _ in $(seq 1080); do
  grep -q "campaign r23 done" runs/campaign_r23.log 2>/dev/null && break
  sleep 10
done
echo "=== campaign r24 start ($(date +%H:%M:%S)) ===" >> "$log"

out=runs/bench_batch_fine_r24.log
: > "$out"
for b in 768 1024 1280 1536 1792; do
  echo "--- batch $b ($(date +%H:%M:%S)) ---" >> "$log"
  timeout 1800 python bench.py --config canonical_fast --batch-size "$b" \
    >> "$out" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
done

echo "=== campaign r24 done ($(date +%H:%M:%S)) ===" >> "$log"
