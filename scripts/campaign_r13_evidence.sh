#!/bin/bash
# Priority-ordered rebuild of the runs/ evidence tree (host reset wiped
# runs/ again before campaigns r11/r12 could execute).  Ordered by how
# prominently BASELINE.md cites each artifact; every train is
# restore-or-init so a wall-clock cutoff mid-list just means the next
# session's campaign resumes where this one stopped.
cd /root/repo || exit 1
mkdir -p runs

train_eval() {
  cfg="$1"; wd="$2"; iters="$3"; seed="$4"; shift 4
  echo "=== $cfg seed $seed -> $wd ($(date +%H:%M:%S)) ==="
  timeout 10800 python -m attend_infer_repeat_tpu.train --config "$cfg" \
    --workdir "$wd" --iters "$iters" --seed "$seed" --no-tensorboard \
    > "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --train-seed "$seed" --batches 16 "$@" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
}

# 1. Quality-bar headline: canonical_fast, 3 seeds (BASELINE "1.0000 on
#    all three seeds", formerly runs/cfv2_seed*).
for s in 0 1 2; do train_eval canonical_fast "runs/cfv4_seed${s}" 60000 "$s"; done

# 2. Shipped-preset u28 validation at the full 150k budget (campaign r12).
train_eval canonical_uniform28 runs/u28_shipped_seed0 150000 0

# 3. Reference-style uniform/overlap placement (formerly runs/uniform_v3).
train_eval canonical_uniform runs/uniform_v4 150000 0

# 4. Config 1: single-glimpse VAE (formerly runs/single_digit_r2).
train_eval single_digit runs/single_digit_r3 25000 0

# 5. Config 4: iwae preset with in-loop k=5 bound (formerly runs/iwae_r3).
train_eval iwae runs/iwae_r4 150000 0 --iwae

# 6. Config 3: crowded 0-5 digits, 100x100, 5 steps.
train_eval crowded runs/crowded_r3 150000 0 --batch-size 512

# 7. Reference operating point: canonical preset, batch 64, lr 1e-5.
train_eval canonical runs/canonical_ref_r3 150000 0

echo "=== campaign r13 done ($(date +%H:%M:%S)) ==="
