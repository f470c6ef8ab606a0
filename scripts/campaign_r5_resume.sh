#!/bin/bash
# Resume of campaign_r4 after the TPU tunnel died mid-seed2 (2026-08-17
# 19:12): the relay process exited on orchestrator EOF, stalling the
# u28v2_seed2 run at step ~76k (checkpoint at 75k).  This script waits
# for the chip to come back (fresh-client probe), then resumes the
# interrupted training (restore-or-init picks up the 75k checkpoint)
# and runs the remaining r4 stages.  Serialized, one TPU process at a
# time; survives session death.
cd /root/repo || exit 1
mkdir -p runs

echo "waiting for TPU health ($(date +%H:%M:%S))"
while true; do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
echo "TPU back ($(date +%H:%M:%S))"

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 10800 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

# resume seed2 (restore-or-init: continues from the latest checkpoint)
run_one u28v2_seed2 python -m attend_infer_repeat_tpu.train \
  --config canonical_uniform28 --workdir runs/u28v2_seed2 --seed 2 \
  --iters 100000 --no-tensorboard

run_one u28v2_seed2_eval python scripts/eval_checkpoint.py \
  --config canonical_uniform28 --workdir runs/u28v2_seed2 \
  --train-seed 2 --batches 16

run_one u28v2_seed2_eval_best python scripts/eval_checkpoint.py \
  --config canonical_uniform28 --workdir runs/u28v2_seed2 \
  --train-seed 2 --batches 16 --best

run_one u28v2_overlap_errors python scripts/analyze_overlap_errors.py \
  --config canonical_uniform28 --workdir runs/u28v2_seed0 --train-seed 0

run_one u28v2_fig python scripts/make_explainaway_fig.py \
  --config canonical_uniform28 --workdir runs/u28v2_seed0 \
  --out docs/explain_away_u28.png --min-iou 0.15

echo "=== campaign r5 resume done ($(date +%H:%M:%S)) ==="
