#!/bin/bash
# Campaign r31: can the basin detector UN-GATE bf16 on crowded?
#
# The r23 gate ("crowded ships f32": seed0 collapses to 0.559 at the
# bf16+decoder_dtype=f32 point) was decided BEFORE two pieces of the
# shipped quality machinery existed: the two-phase max_scale cap
# (rescued the merge-ladder basin, campaign r25) and the early-basin
# detect-and-restart policy (converted 6/6 crowded seeds to >=0.9998,
# campaigns r26/r30).  The bf16 collapse is the same failure class —
# early basin selection — which is exactly what the detector converts.
# If the dtype-flipped preset now trains >=0.99 on the gated seed0 AND a
# fresh seed, the crowded preset can ship the canonical fast operating
# point (bf16 + decoder_dtype=f32 + remat/save_st) for ~+20-25%
# throughput; otherwise the r23 gate stands with refreshed evidence.
#
# Also: preset-verbatim headline re-bench at HEAD (the r28 headline log
# predates the save_st preset flip, so the committed default-invocation
# number is stale at 481k vs the measured 506k).
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r31.log

# Wait for campaign r30 to release the TPU (pid file written at launch).
while kill -0 "$(cat /tmp/r30.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo "=== campaign r31 start ($(date +%H:%M:%S)) ===" >> "$log"

bench_point () {  # name args...
  local name="$1"; shift
  local out="runs/bench_${name}_r31.log"
  if [ -s "$out" ] && grep -q '"metric"' "$out"; then
    echo "=== bench $name already measured, skipping ===" >> "$log"; return
  fi
  echo "=== bench $name: $* ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 2400 python bench.py "$@" > "$out" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"value": [0-9.]*' "$out" | head -1 >> "$log"
}

bench_point headline
bench_point crowded_bf16 --config crowded --dtype bfloat16 --remat \
  --remat-policy save_st

probe () {  # workdir seed
  local wd="$1" seed="$2"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config crowded \
    --workdir "$wd" \
    --model-set "dtype='bfloat16'" --model-set "decoder_dtype='float32'" \
    --model-set "remat=True" --model-set "remat_policy='save_st'" \
    --train-set "seed=$seed" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 32 \
    --model-set "dtype='bfloat16'" --model-set "decoder_dtype='float32'" \
    --model-set "remat=True" --model-set "remat_policy='save_st'" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

# seed0 = the r23-gated collapse seed; seed20 = fresh control
probe runs/crowded_bf16det_seed0 0
probe runs/crowded_bf16det_seed20 20

echo "=== campaign r31 done ($(date +%H:%M:%S)) ===" >> "$log"
