#!/bin/bash
# Campaign r48 (round 5): new-point coverage + two probe benches.
#   1. Probe: crowded + bf16 canvas carry (crowded is f32/no-remat —
#      the carry is a plain saved activation there; if the bench moves
#      >3% it earns its own quality gate, else document).
#   2. Probe: literal batch-64 canonical at scan_steps=100 (trip-count
#      bit-exact — a pure perf knob for the reference-regime row).
#   3. iwae + iwae_trained preset-verbatim seeds at the new operating
#      point (scan100 + bf16 carry), so every flipped preset has a
#      living artifact at the shipped numerics.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r48.log
echo "=== campaign r48 start ($(date +%H:%M:%S)) ===" >> "$log"

echo "=== bench crowded + bf16 carry probe ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python bench.py --config crowded \
  --model-set "canvas_carry_dtype='bfloat16'" \
  > runs/bench_crowded_bf16carry.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_crowded_bf16carry.log | head -1 >> "$log"

echo "=== bench canonical b64 scan100 probe ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python bench.py --config canonical --scan-steps 100 \
  > runs/bench_canonical_scan100.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_canonical_scan100.log | head -1 >> "$log"
echo "=== bench canonical b64 verbatim control ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python bench.py --config canonical \
  > runs/bench_canonical_r48.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
grep -o '"value": [0-9.]*' runs/bench_canonical_r48.log | head -1 >> "$log"

train_eval () {  # workdir config extra-args...
  local wd="$1" cfg="$2"; shift 2
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 10800 python scripts/run_variant.py --config "$cfg" \
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

train_eval runs/iwae_r8          iwae         --train-set "seed=0"
train_eval runs/iwae_trained_r3  iwae_trained --train-set "seed=0"

echo "=== campaign r48 done ($(date +%H:%M:%S)) ===" >> "$log"
