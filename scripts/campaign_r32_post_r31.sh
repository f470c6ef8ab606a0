#!/bin/bash
# Campaign r32: round-4 continuation probes, queued behind campaign r31.
#
#   1. scan_steps re-tune at HEAD (the shipped 20 was tuned BEFORE the
#      byte diet + save_st landed; the carry/dispatch trade may have
#      moved — the byte map's residual top rows are the scan's saved
#      per-step carry, so a longer scan body changes what is saved)
#   2. serving sweep re-run at HEAD (last measured r3; the byte-diet
#      image-out-of-carry change also touches the serving forward)
#   3. literal-regime seeds 7-9 (~3 min each) — n=7 -> n=10 on the
#      reference-regime ceiling distribution
#   4. conditional: if BOTH r31 bf16-detector probes (seed0, seed20)
#      cleared 0.99, a third fresh seed (21) before any preset un-gate
# Idempotent: every item skips itself if its evidence already exists.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r32.log

# Wait for campaign r31 to finish (it appends a done banner to its log).
while ! grep -q "campaign r31 done" runs/campaign_r31.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r32 start ($(date +%H:%M:%S)) ===" >> "$log"

bench_point () {  # name args...
  local name="$1"; shift
  local out="runs/bench_${name}_r32.log"
  if [ -s "$out" ] && grep -q '"metric"' "$out"; then
    echo "=== bench $name already measured, skipping ===" >> "$log"; return
  fi
  echo "=== bench $name: $* ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 2400 python bench.py "$@" > "$out" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"value": [0-9.]*' "$out" | head -1 >> "$log"
}

# ---- 1. scan_steps re-tune at HEAD --------------------------------------
for k in 10 16 32 50; do
  bench_point "scan${k}" --config canonical_fast --scan-steps "$k"
done

# ---- 2. serving sweep at HEAD --------------------------------------------
if ! grep -q '"date": "2026-08-20"' benchmarks/results.jsonl 2>/dev/null \
   || ! grep -q '"bench": "serving"' <(grep '2026-08-20' benchmarks/results.jsonl) ; then
  echo "=== serving sweep ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 3600 python -m benchmarks.harness serving \
    > runs/bench_serving_r32.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
fi

# ---- 3. literal-regime seeds 7-9 -----------------------------------------
train_eval () {  # workdir config eval_batch eval_batches extra-args...
  local wd="$1" cfg="$2" eb="$3" en="$4"; shift 4
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config "$cfg" \
    --workdir "$wd" "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --batch-size "$eb" --batches "$en" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

for s in 7 8 9; do
  train_eval "runs/canonical_ref150k_seed$s" canonical 1024 16 \
    --iters 150000 --train-set "seed=$s"
done

# ---- 4. conditional third bf16-detector seed ------------------------------
pass () {  # eval_log — mode accuracy >= 0.99?
  python - "$1" <<'EOF'
import json, re, sys
try:
    txt = open(sys.argv[1]).read()
    m = re.findall(r'"count_accuracy_mode": ([0-9.]+)', txt)
    sys.exit(0 if m and float(m[-1]) >= 0.99 else 1)
except Exception:
    sys.exit(1)
EOF
}
if pass runs/crowded_bf16det_seed0_eval.log && \
   pass runs/crowded_bf16det_seed20_eval.log; then
  echo "=== r31 probes passed; third seed 21 ($(date +%H:%M:%S)) ===" >> "$log"
  wd=runs/crowded_bf16det_seed21
  if [ ! -s "${wd}_eval.log" ] || ! grep -q '"count_accuracy"' "${wd}_eval.log"; then
    timeout 14400 python scripts/run_variant.py --config crowded \
      --workdir "$wd" \
      --model-set "dtype='bfloat16'" --model-set "decoder_dtype='float32'" \
      --model-set "remat=True" --model-set "remat_policy='save_st'" \
      --train-set "seed=21" >> "${wd}.log" 2>&1
    echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
    timeout 2400 python scripts/eval_checkpoint.py --config crowded \
      --workdir "$wd" --batch-size 512 --batches 32 \
      --model-set "dtype='bfloat16'" --model-set "decoder_dtype='float32'" \
      --model-set "remat=True" --model-set "remat_policy='save_st'" \
      > "${wd}_eval.log" 2>&1
    echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
    grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
  fi
else
  echo "=== r31 probes did not both pass; gate stands ===" >> "$log"
fi

echo "=== campaign r32 done ($(date +%H:%M:%S)) ===" >> "$log"
