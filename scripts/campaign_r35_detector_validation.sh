#!/bin/bash
# Campaign r35: validate the r4 preset retune (scan_steps=50 + basin
# detect-and-restart on the 50x50 presets), queued behind campaign r34.
#   1. cfv5det_seed2 — canonical_fast preset VERBATIM at the seed that
#      froze at 0.7515 without the detector (runs/cfv5_seed2).  Expected:
#      the 10k gate reads ~0.748, fires, and a folded-seed restart lands
#      >=0.99 — converting the canonical preset into the same reliable
#      procedure as crowded.
#   2. Headline bench at HEAD (preset now ships scan_steps=50): expect
#      ~516.5k img/s, matching runs/bench_scan50_r32.log.
#   3. Crowded scan50-vs-shipped-scan20 bench probes: flip the crowded
#      preset to 50 only if measured faster (scan is bit-exact, so the
#      only question is dispatch amortization on the 100x100 step).
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r35.log

while ! grep -q "campaign r34 done" runs/campaign_r34.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r35 start ($(date +%H:%M:%S)) ===" >> "$log"

if ! { [ -s runs/cfv5det_seed2_eval.log ] && grep -q '"count_accuracy"' runs/cfv5det_seed2_eval.log; }; then
  echo "=== runs/cfv5det_seed2 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config canonical_fast \
    --workdir runs/cfv5det_seed2 --train-set "seed=2" \
    >> runs/cfv5det_seed2.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" runs/cfv5det_seed2.log | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical_fast \
    --workdir runs/cfv5det_seed2 --batch-size 1024 --batches 16 \
    > runs/cfv5det_seed2_eval.log 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' runs/cfv5det_seed2_eval.log | tail -1 >> "$log"
fi

echo "=== bench headline at HEAD (scan50 preset verbatim) ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1200 python bench.py > runs/bench_headline_r35.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_headline_r35.log | head -1 >> "$log"

echo "=== bench crowded shipped (scan20) ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1200 python bench.py --config crowded > runs/bench_crowded_scan20_r35.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_crowded_scan20_r35.log | head -1 >> "$log"

echo "=== bench crowded scan50 probe ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1200 python bench.py --config crowded --scan-steps 50 > runs/bench_crowded_scan50_r35.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_crowded_scan50_r35.log | head -1 >> "$log"

echo "=== campaign r35 done ($(date +%H:%M:%S)) ===" >> "$log"
