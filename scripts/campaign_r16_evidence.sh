#!/bin/bash
# Campaign r16: rebuild of the evidence queue after the 2026-08-18 host
# reset killed campaign r15 mid-run and wiped every checkpoint in runs/.
# Nothing can resume (restore-or-init finds no checkpoint), so each
# incomplete row retrains from scratch; rows whose FULL-budget eval log
# already exists at HEAD are skipped by the eval-log guard below.
#
# Evidence discipline (ADVICE r2): train logs append ('>>'); a row is
# done when its eval log contains "restored step <iters>"; stale
# metrics.jsonl from a wiped run is rotated aside (not appended to) so
# each metrics file holds exactly one trajectory.
cd /root/repo || exit 1
mkdir -p runs

train_eval() {
  cfg="$1"; wd="$2"; iters="$3"; seed="$4"; shift 4
  train_extra=(); eval_extra=(); seen_sep=0
  for a in "$@"; do
    if [ "$a" = "--" ]; then seen_sep=1; continue; fi
    if [ "$seen_sep" = 0 ]; then train_extra+=("$a"); else eval_extra+=("$a"); fi
  done
  ev_log="${wd}_eval.log"
  case " ${eval_extra[*]} " in *" --best "*) ev_log="${wd}_eval_best.log";; esac
  if [ -s "$ev_log" ] && grep -q "restored step ${iters}" "$ev_log"; then
    echo "=== $wd: eval already at step ${iters}; row complete, skipping ==="
    return 0
  fi
  # No checkpoint can have survived the reset: if the workdir has a stale
  # metrics.jsonl but no checkpoint dir with content, rotate it aside.
  if [ -f "${wd}/metrics.jsonl" ] && [ -z "$(ls -A ${wd}/ckpt 2>/dev/null)" ]; then
    mv "${wd}/metrics.jsonl" "${wd}/metrics.jsonl.pre_reset_$(date +%m%d%H%M)"
    echo "(rotated stale metrics.jsonl in $wd)"
  fi
  echo "=== $cfg seed $seed -> $wd @${iters} ($(date +%H:%M:%S)) ==="
  timeout 14400 python -m attend_infer_repeat_tpu.train --config "$cfg" \
    --workdir "$wd" --iters "$iters" --seed "$seed" --no-tensorboard \
    "${train_extra[@]}" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --train-seed "$seed" --batches 16 "${eval_extra[@]}" \
    > "$ev_log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
}

# 1. Shipped-preset canonical_fast (bf16+scan+remat) quality, 2 seeds.
#    seed 0's r15 train finished but the reset killed the eval AND the
#    checkpoint, so it retrains (~7 min at 450k img/s).
for s in 0 1; do train_eval canonical_fast "runs/cfv5_seed${s}" 150000 "$s"; done

# 2. Shipped-preset u28 validation (n_what=20, bf16 flip), 2 seeds.
for s in 0 1; do train_eval canonical_uniform28 "runs/u28v5_seed${s}" 150000 "$s"; done

# 3. Shipped-preset uniform validation.
train_eval canonical_uniform runs/uniform_v5 150000 0

# 4. Config 3: crowded (preset unchanged/f32).
train_eval crowded runs/crowded_r3 150000 0 -- --batch-size 512

# 5. Literal reference regime: 150k milestone eval, then extend the same
#    run to its full 300k budget (VERDICT r3 #3), 2 seeds.
for s in 0 1; do
  if [ ! -s "runs/canonical_ref300k_seed${s}_eval150k.log" ]; then
    train_eval canonical "runs/canonical_ref300k_seed${s}" 150000 "$s"
    cp "runs/canonical_ref300k_seed${s}_eval.log" \
       "runs/canonical_ref300k_seed${s}_eval150k.log" 2>/dev/null
  fi
  train_eval canonical "runs/canonical_ref300k_seed${s}" 300000 "$s"
done

# 6. Best-eval snapshots for the serving artifact rows.
for wd in runs/cfv5_seed0 runs/u28v5_seed0; do
  cfgname=canonical_fast; case "$wd" in *u28*) cfgname=canonical_uniform28;; esac
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfgname" \
    --workdir "$wd" --train-seed 0 --batches 16 --best \
    > "${wd}_eval_best.log" 2>&1
  echo "best-eval $wd rc=$? ($(date +%H:%M:%S))"
done

echo "=== campaign r16 done ($(date +%H:%M:%S)) ==="
