#!/bin/bash
# Round-2 measurement campaign, phase 2: canonical-regime ablation
# (VERDICT #2), bf16 validation (#6), crowded ≥0.9-or-ceiling (#8).
# Serialized — one TPU process at a time.
cd /root/repo || exit 1
mkdir -p runs

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 7200 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

# --- canonical-regime ablation (batch 64, lr 1e-5 held fixed) ----------
for v in ref ref+prior ref+expl ref+cap ref+both ref+fast ref+all; do
  run_one "ablate_${v//+/_}" python scripts/ablate_canonical.py \
    --variant "$v" --iters 150000
done

# --- bf16 end-to-end validation ----------------------------------------
run_one cf_bf16 python scripts/run_variant.py --config canonical_fast \
  --workdir runs/cf_bf16 --model-set "dtype='bfloat16'"
run_one cf_bf16_eval python scripts/eval_checkpoint.py --config canonical_fast \
  --workdir runs/cf_bf16 --batches 16

# --- crowded: preset + conv-stem/20px variant --------------------------
run_one crowded python scripts/run_variant.py --config crowded \
  --workdir runs/crowded_r2
run_one crowded_eval python scripts/eval_checkpoint.py --config crowded \
  --workdir runs/crowded_r2 --batch-size 512 --batches 16

run_one crowded_conv20 python scripts/run_variant.py --config crowded \
  --workdir runs/crowded_conv20 \
  --model-set "encoder_conv=(16,32)" \
  --model-set "where_prior_loc=(0.2,0.2,0.0,0.0)" \
  --data-set "digit_size=(20,20)"

echo "=== phase 2 done ($(date +%H:%M:%S)) ==="
