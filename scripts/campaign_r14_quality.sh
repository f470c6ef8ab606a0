#!/bin/bash
# Campaign r14: quality re-validation at the FLIPPED shipped presets
# (VERDICT r3 #1: canonical_fast / canonical_uniform / canonical_uniform28 /
# iwae now ship bf16 + scan_steps=20 + remat — the benched operating point),
# plus the r13 evidence-rebuild tail (VERDICT r3 #2) and the full-budget
# literal reference regime (VERDICT r3 #3).
#
# ADVICE r2 #1 fix: train logs APPEND ('>>') so a resumed session cannot
# truncate committed evidence; eval is skipped when its log already shows
# the target step (idempotent re-entry after a wall-clock cutoff).
cd /root/repo || exit 1
mkdir -p runs

train_eval() {
  cfg="$1"; wd="$2"; iters="$3"; seed="$4"; shift 4
  # split remaining args at '--' into train-overrides and eval-extras
  train_extra=(); eval_extra=(); seen_sep=0
  for a in "$@"; do
    if [ "$a" = "--" ]; then seen_sep=1; continue; fi
    if [ "$seen_sep" = 0 ]; then train_extra+=("$a"); else eval_extra+=("$a"); fi
  done
  echo "=== $cfg seed $seed -> $wd ($(date +%H:%M:%S)) ==="
  timeout 10800 python -m attend_infer_repeat_tpu.train --config "$cfg" \
    --workdir "$wd" --iters "$iters" --seed "$seed" --no-tensorboard \
    "${train_extra[@]}" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  if [ -s "${wd}_eval.log" ] && grep -q "restored step ${iters}" "${wd}_eval.log"; then
    echo "eval already at step ${iters}; skipping"
  else
    timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
      --workdir "$wd" --train-seed "$seed" --batches 16 "${eval_extra[@]}" \
      > "${wd}_eval.log" 2>&1
    echo "eval rc=$? ($(date +%H:%M:%S))"
  fi
}

# 1. Shipped-preset (bf16+scan+remat) quality: canonical_fast, 2 seeds.
for s in 0 1; do train_eval canonical_fast "runs/cfv5_seed${s}" 60000 "$s"; done

# 2. Finish the r13 uniform_v4 rebuild at its ORIGINAL f32 recipe (resume
#    from 100k; dtype pinned so the preset flip can't change the run's
#    numerics mid-stream — scan/remat are numerics-neutral, dtype is not).
train_eval canonical_uniform runs/uniform_v4 150000 0 \
  --dtype float32 --no-remat -- --model-set "dtype='float32'"

# 3. Shipped-preset u28 validation, 2 seeds (VERDICT weak #7 + flip).
for s in 0 1; do train_eval canonical_uniform28 "runs/u28v5_seed${s}" 150000 "$s"; done

# 4. Shipped-preset uniform validation.
train_eval canonical_uniform runs/uniform_v5 150000 0

# 5. Config 4: iwae preset (flipped) with in-loop k=5 bound (r13 item 5).
train_eval iwae runs/iwae_r4 150000 0 -- --iwae

# 6. Config 1: single-glimpse VAE (r13 item 4).
train_eval single_digit runs/single_digit_r3 25000 0

# 7. Literal reference regime at its FULL 300k budget, 2 seeds
#    (VERDICT r3 #3: what is the literal-regime ceiling actually?).
for s in 0 1; do
  train_eval canonical "runs/canonical_ref300k_seed${s}" 300000 "$s"
done

# 8. Config 3: crowded 0-5 digits, 100x100 (r13 item 6; preset unchanged
#    — the bf16/remat win is unmeasured at this shape, f32 evidence
#    stands).  Eval batch 512 matches the 100x100 memory envelope.
train_eval crowded runs/crowded_r3 150000 0 -- --batch-size 512

echo "=== campaign r14 done ($(date +%H:%M:%S)) ==="
