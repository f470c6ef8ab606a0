#!/bin/bash
# Campaign r37: perf tail + last HEAD refreshes, queued behind r36.
#   1. serving generate/infer at batch 65536/131072 — the r32 sweep is
#      monotone in batch for generate through 32768 (3.39M img/s), so
#      probe where it saturates.
#   2. scan_steps=100 probe on the canonical headline (the 10..50 sweep
#      is monotone but flattening: +0.7% from 32->50).
#   3. iwae_trained refresh at HEAD (the VIMCO-objective row's artifact
#      predates save_st/scan50; ~4.5x the ELBO step cost).
#   4. cfv5det_seed5 — one more canonical seed through the shipped
#      detector procedure.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r37.log

while ! grep -q "campaign r36 done" runs/campaign_r36.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r37 start ($(date +%H:%M:%S)) ===" >> "$log"

echo "=== serving wide-batch probe ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python -c "
from benchmarks.harness import bench_serving
bench_serving(batch_sizes=(65536, 131072))
" > runs/bench_serving_wide_r37.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

echo "=== bench scan100 probe ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1200 python bench.py --config canonical_fast --scan-steps 100 \
  > runs/bench_scan100_r37.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_scan100_r37.log | head -1 >> "$log"

train_eval () {  # workdir config eval_batch eval_batches extra-args...
  local wd="$1" cfg="$2" eb="$3" en="$4"; shift 4
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config "$cfg" \
    --workdir "$wd" "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" "${wd}.log" | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --batch-size "$eb" --batches "$en" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

train_eval runs/iwae_trained_r2  iwae_trained   1024 16 --train-set "seed=0"
train_eval runs/cfv5det_seed5    canonical_fast 1024 16 --train-set "seed=5"

echo "=== campaign r37 done ($(date +%H:%M:%S)) ===" >> "$log"
