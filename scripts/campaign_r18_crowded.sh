#!/bin/bash
# Campaign r18: crowded-preset basin variance + capacity probe.
#
# Context: the r16 evidence rebuild of the crowded headline row
# (runs/crowded_r3, seed 0, preset verbatim) lands at 0.9083 held-out
# vs the historical 0.9851 claim (runs/crowded_nocap, 2026-08-17,
# artifacts lost to the host resets).  Code/preset/seed are verified
# identical (git diff 78f635a..HEAD is behavior-neutral for this
# config), so the leading hypothesis is basin/seed variance — the same
# merged-window local optimum family measured on u28 and in the all-bf16
# fragility row.  The r3 confusion is pure high-count merges (3->2,
# 4->3, 5->4) with a dead-flat plateau from 8k steps.
#
# Items (each ~15 min TPU at 150k steps):
#   1. seeds 1, 2 at the shipped preset      -> basin variance measured
#   2. n_what=20 capacity probe, seed 0      -> the u28 anti-merge fix
#      (a 20-dim z_what cannot encode a two-digit composite, so merges
#      pay likelihood instead of saving KL)
#   3. n_what=20 seed 1 (only if item 2 beats 0.95 — seed-robustness)
cd /root/repo || exit 1
mkdir -p runs

# Serialize behind campaign r17 (one TPU process at a time).
while ! grep -q "campaign r17 done" runs/campaign_r17.log 2>/dev/null; do
  sleep 60
done
echo "=== r17 done; starting crowded probes ($(date +%H:%M:%S)) ==="

for s in 1 2; do
  wd="runs/crowded_r3_seed${s}"
  if [ -s "${wd}_eval.log" ] && grep -q "restored step 150000" "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ==="; continue
  fi
  echo "=== crowded seed $s -> $wd @150000 ($(date +%H:%M:%S)) ==="
  timeout 7200 python -m attend_infer_repeat_tpu.train --config crowded \
    --workdir "$wd" --iters 150000 --seed "$s" --no-tensorboard \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --train-seed "$s" --batch-size 512 --batches 16 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
done

wd=runs/crowded_what20
echo "=== crowded n_what=20 seed 0 -> $wd @150000 ($(date +%H:%M:%S)) ==="
timeout 7200 python scripts/run_variant.py --config crowded \
  --workdir "$wd" --iters 150000 --model-set "n_what=20" \
  >> "${wd}.log" 2>&1
echo "rc=$? ($(date +%H:%M:%S))"
timeout 2400 python scripts/eval_checkpoint.py --config crowded \
  --workdir "$wd" --train-seed 0 --batch-size 512 --batches 16 \
  --model-set "n_what=20" > "${wd}_eval.log" 2>&1
echo "eval rc=$? ($(date +%H:%M:%S))"

# Seed-robustness leg, gated on the probe clearing the historical band.
acc=$(grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 \
      | grep -o '[0-9.]*$')
if [ -n "$acc" ] && python3 -c "import sys; sys.exit(0 if float('$acc') >= 0.95 else 1)"; then
  wd=runs/crowded_what20_s1
  echo "=== crowded n_what=20 seed 1 -> $wd @150000 ($(date +%H:%M:%S)) ==="
  timeout 7200 python scripts/run_variant.py --config crowded \
    --workdir "$wd" --iters 150000 --model-set "n_what=20" \
    --train-set "seed=1" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --train-seed 1 --batch-size 512 --batches 16 \
    --model-set "n_what=20" > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
else
  echo "(what20 probe at ${acc:-n/a} < 0.95 — skipping the seed-1 leg)"
fi

echo "=== campaign r18 done ($(date +%H:%M:%S)) ==="
