#!/bin/bash
# Campaign r47 (round 5): validate the NEW shipped operating point
# (scan_steps=100 + bf16 canvas carry on the five bf16 50×50 presets).
#   1. canonical_fast preset-verbatim ×2 seeds (the quality refresh the
#      r4 precedent requires after a driver retune).
#   2. canonical_uniform28 preset-verbatim ×1 (the late-drift-sensitive
#      task) + best-ckpt eval; canonical_uniform ×1 for coverage.
#   3. THREE clean headline benches at the new preset + byte map.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r47.log
echo "=== campaign r47 start ($(date +%H:%M:%S)) ===" >> "$log"

train_eval () {  # workdir config extra-args...
  local wd="$1" cfg="$2"; shift 2
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config "$cfg" \
    --workdir "$wd" "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" "${wd}.log" | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --batch-size 1024 --batches 16 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
  grep -o '"elbo": [0-9.]*' "${wd}_eval.log" | head -1 >> "$log"
}

train_eval runs/cfv6_seed0    canonical_fast      --train-set "seed=0"
train_eval runs/cfv6_seed1    canonical_fast      --train-set "seed=1"
train_eval runs/u28v7_seed0   canonical_uniform28 --train-set "seed=0"
train_eval runs/uniform_v6_s0 canonical_uniform   --train-set "seed=0"

echo "=== u28v7 best-ckpt eval ($(date +%H:%M:%S)) ===" >> "$log"
timeout 2400 python scripts/eval_checkpoint.py --config canonical_uniform28 \
  --workdir runs/u28v7_seed0 --batch-size 1024 --batches 16 --best \
  > runs/u28v7_seed0_eval_best.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"count_accuracy_mode": [0-9.]*' runs/u28v7_seed0_eval_best.log | tail -1 >> "$log"

for i in 1 2 3; do
  echo "=== headline bench $i (new point) ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 1800 python bench.py > "runs/bench_headline_r47_$i.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"value": [0-9.]*' "runs/bench_headline_r47_$i.log" | head -1 >> "$log"
done

echo "=== byte_map at the new point ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python scripts/byte_map.py --out runs/byte_map_r47.json \
  > runs/byte_map_r47.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

echo "=== campaign r47 done ($(date +%H:%M:%S)) ===" >> "$log"
