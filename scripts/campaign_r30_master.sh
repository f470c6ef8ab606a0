#!/bin/bash
# Campaign r30: round-4 MASTER queue (relaunch after the 2026-08-20 host
# reset wiped the untracked campaign state mid-r26).  Runs every
# remaining round-4 TPU item serially, in priority order, idempotently —
# each item skips itself if its committed evidence already exists, so
# the script can be restarted after any reset.
#
# Order:
#   1. r28 perf benches  (headline-at-HEAD post byte-diet; crowded >=130k
#      gate; the decisive Pallas x remat save_st experiment; byte_map
#      after-picture)
#   2. r26 remainder     (crowded fresh seed14 + known-frozen seed2
#      control under the shipped detector)
#   3. iwae preset retrain (checkpoint for the k-sweep; the r5 ckpt was
#      lost to the reset — quality row already documented)
#   4. literal-regime seed distribution (5 fresh seeds x 150k, batch 64)
#   5. VIMCO-trained IWAE objective at full budget + eval
#   6. k-sweeps (k in {1,5,25} + IWAE-64) on both checkpoints
#   7. r29 contingency variance probes on seed2 (detector off)
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r30.log
echo "=== campaign r30 start ($(date +%H:%M:%S)) ===" >> "$log"

bench_point () {  # name args...
  local name="$1"; shift
  local out="runs/bench_${name}_r28.log"
  if [ -s "$out" ] && grep -q '"metric"' "$out"; then
    echo "=== bench $name already measured, skipping ===" >> "$log"; return
  fi
  echo "=== bench $name: $* ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 2400 python bench.py "$@" > "$out" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"value": [0-9.]*' "$out" | head -1 >> "$log"
}

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
    --workdir "$wd" --batch-size "$eb" --batches "$en" $EVAL_EXTRA \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

# ---- 1. perf benches (short, high-value evidence first) -----------------
bench_point headline
bench_point headline2
bench_point crowded       --config crowded
bench_point xla_savest    --config canonical_fast --remat-policy save_st
bench_point pallas_b32          --config canonical_fast --st-method pallas --st-block-b 32
bench_point pallas_b32_savest   --config canonical_fast --st-method pallas --st-block-b 32 --remat-policy save_st
bench_point pallas_b8_savest    --config canonical_fast --st-method pallas --st-block-b 8  --remat-policy save_st

if [ ! -s runs/byte_map_r4_after.json ]; then
  echo "=== byte_map after ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 2400 python scripts/byte_map.py --config canonical_fast --top 25 \
    --out runs/byte_map_r4_after.json > runs/byte_map_r4_after.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
fi

# ---- 2. r26 remainder: crowded fresh seed14 + frozen-seed2 control ------
train_eval runs/crowded_v2_seed14 crowded 512 32 --train-set "seed=14"
train_eval runs/crowded_v2_seed2  crowded 512 32 --train-set "seed=2"

# ---- 3. iwae preset retrain (k-sweep checkpoint; reset lost the r5 one) -
EVAL_EXTRA="--iwae" train_eval runs/iwae_r6 iwae 1024 16

# ---- 4. literal-regime seed distribution (VERDICT r3 next #7) -----------
for s in 2 3 4 5 6; do
  train_eval "runs/canonical_ref150k_seed$s" canonical 1024 16 \
    --iters 150000 --train-set "seed=$s"
done

# ---- 5. VIMCO-trained IWAE objective (VERDICT r3 next #6) ---------------
EVAL_EXTRA="--iwae" train_eval runs/iwae_trained_r1 iwae_trained 1024 16

# ---- 6. k-sweeps (VERDICT r3 next #8 + #6 density comparison) -----------
ksweep () {  # run config
  local run="$1" cfg="$2" out="runs/${1}_ksweep.log"
  if [ -s "$out" ] && grep -q "monotone_in_k" "$out"; then
    echo "=== $out already complete, skipping ===" >> "$log"; return
  fi
  echo "=== ksweep $run ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 3600 python scripts/iwae_ksweep.py --config "$cfg" \
    --workdir "runs/$run" --ks 1 5 25 --batch-size 1024 --batches 8 \
    > "$out" 2>&1
  timeout 3600 python scripts/iwae_ksweep.py --config "$cfg" \
    --workdir "runs/$run" --ks 64 --batch-size 256 --batches 32 \
    >> "$out" 2>&1
  echo "ksweep rc=$? ($(date +%H:%M:%S))" >> "$log"
}
ksweep iwae_r6 iwae
ksweep iwae_trained_r1 iwae_trained

# ---- 7. r29 contingency: variance levers on frozen seed2, detector off --
train_eval runs/crowded_var_b1024_s2 crowded 512 32 \
  --train-set "seed=2" --train-set "basin_detect_step=0" \
  --train-set "batch_size=1024" --train-set "learning_rate=1.4e-4"
train_eval runs/crowded_var_advnorm_s2 crowded 512 32 \
  --train-set "seed=2" --train-set "basin_detect_step=0" \
  --train-set "advantage_norm=True"

echo "=== campaign r30 done ($(date +%H:%M:%S)) ===" >> "$log"
