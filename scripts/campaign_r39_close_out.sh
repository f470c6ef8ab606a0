#!/bin/bash
# Campaign r39 (round 5): the r38 close-out that never ran (VERDICT r5
# missing #1) plus the third u28 HEAD seed (weak #1 asks >=3 seeds).
#   1. cfv5det_seed5 — 6th canonical-procedure seed (r37 host reset
#      killed it 2 lines in).
#   2. u28v6_seed{1,2} — u28 HEAD-preset seeds so the HEAD row stops
#      resting on one 0.9897 read.
#   3. byte_map refresh at the scan50 HEAD program.
#   4. THREE clean preset-verbatim headline benches (median pins the
#      ±5% run-to-run spread: 491.7k vs 516.5k vs 504.1k — weak #6).
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r39.log
echo "=== campaign r39 start ($(date +%H:%M:%S)) ===" >> "$log"

train_eval () {  # workdir config eval_batch eval_batches extra-args...
  local wd="$1" cfg="$2" eb="$3" en="$4"; shift 4
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config "$cfg" \
    --workdir "$wd" "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" "${wd}.log" | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --batch-size "$eb" --batches "$en" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

train_eval runs/cfv5det_seed5 canonical_fast      1024 16 --train-set "seed=5"
train_eval runs/u28v6_seed1   canonical_uniform28 1024 16 --train-set "seed=1"
train_eval runs/u28v6_seed2   canonical_uniform28 1024 16 --train-set "seed=2"

if [ ! -s runs/byte_map_r39.json ]; then
  echo "=== byte_map refresh at HEAD ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 1800 python scripts/byte_map.py --out runs/byte_map_r39.json \
    > runs/byte_map_r39.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
fi

for i in 1 2 3; do
  echo "=== headline bench $i ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 1200 python bench.py > "runs/bench_headline_r39_$i.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"value": [0-9.]*' "runs/bench_headline_r39_$i.log" | head -1 >> "$log"
done

echo "=== campaign r39 done ($(date +%H:%M:%S)) ===" >> "$log"
