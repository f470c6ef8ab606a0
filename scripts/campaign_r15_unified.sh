#!/bin/bash
# Campaign r15: unified serialized queue replacing r13's tail + r14.
# One TPU process at a time (r13, surviving from the previous session,
# was found running CONCURRENTLY with r14 — both were stopped; every
# train below is restore-or-init, so this queue resumes all of it).
#
# Budgets: quality validation runs at each preset's FULL shipped budget
# (cfv5 at 150k — the 60k r14 budget was inherited from the old f32
# evidence and undercuts the preset's own n_iters/lr-decay horizon);
# the literal reference regime gets its full 300k (VERDICT r3 #3).
cd /root/repo || exit 1
mkdir -p runs

train_eval() {
  cfg="$1"; wd="$2"; iters="$3"; seed="$4"; shift 4
  train_extra=(); eval_extra=(); seen_sep=0
  for a in "$@"; do
    if [ "$a" = "--" ]; then seen_sep=1; continue; fi
    if [ "$seen_sep" = 0 ]; then train_extra+=("$a"); else eval_extra+=("$a"); fi
  done
  echo "=== $cfg seed $seed -> $wd @${iters} ($(date +%H:%M:%S)) ==="
  timeout 14400 python -m attend_infer_repeat_tpu.train --config "$cfg" \
    --workdir "$wd" --iters "$iters" --seed "$seed" --no-tensorboard \
    "${train_extra[@]}" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  ev_log="${wd}_eval.log"
  case " ${eval_extra[*]} " in *" --best "*) ev_log="${wd}_eval_best.log";; esac
  if [ -s "$ev_log" ] && grep -q "restored step ${iters}" "$ev_log"; then
    echo "eval already at step ${iters}; skipping"
  else
    timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
      --workdir "$wd" --train-seed "$seed" --batches 16 "${eval_extra[@]}" \
      > "$ev_log" 2>&1
    echo "eval rc=$? ($(date +%H:%M:%S))"
  fi
}

# 1. Finish iwae_r4 (r13 item 5; killed at ~130k) — flipped bf16 preset.
train_eval iwae runs/iwae_r4 150000 0 -- --iwae

# 2. Shipped-preset canonical_fast quality at the FULL 150k budget, 2 seeds
#    (seed 0 extends its 60k run; seed 1 resumes from ~30k).
for s in 0 1; do train_eval canonical_fast "runs/cfv5_seed${s}" 150000 "$s"; done

# 3. Shipped-preset u28 validation, 2 seeds.
for s in 0 1; do train_eval canonical_uniform28 "runs/u28v5_seed${s}" 150000 "$s"; done

# 4. Shipped-preset uniform validation (uniform_v4 is the completed f32 row).
train_eval canonical_uniform runs/uniform_v5 150000 0

# 5. Config 3: crowded (r13 item 6; preset unchanged/f32).
train_eval crowded runs/crowded_r3 150000 0 -- --batch-size 512

# 6. Literal reference regime: 150k milestone eval, then extend the same
#    run to its full 300k budget (VERDICT r3 #3), 2 seeds.
for s in 0 1; do
  if [ ! -s "runs/canonical_ref300k_seed${s}_eval150k.log" ]; then
    # 150k milestone (comparable to the r2 ablation table), then extend
    train_eval canonical "runs/canonical_ref300k_seed${s}" 150000 "$s"
    cp "runs/canonical_ref300k_seed${s}_eval.log" \
       "runs/canonical_ref300k_seed${s}_eval150k.log" 2>/dev/null
  fi
  train_eval canonical "runs/canonical_ref300k_seed${s}" 300000 "$s"
done

# 7. Best-eval snapshots for the serving artifact rows.
for wd in runs/cfv5_seed0 runs/u28v5_seed0; do
  cfgname=canonical_fast; case "$wd" in *u28*) cfgname=canonical_uniform28;; esac
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfgname" \
    --workdir "$wd" --train-seed 0 --batches 16 --best \
    > "${wd}_eval_best.log" 2>&1
  echo "best-eval $wd rc=$? ($(date +%H:%M:%S))"
done

echo "=== campaign r15 done ($(date +%H:%M:%S)) ==="
