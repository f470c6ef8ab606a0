#!/bin/bash
# Round-3 phase 2: re-validate the cap-using flagship presets at HEAD
# (the max_scale cap switched from straight-through to a true clip —
# identical forward, different training dynamics), then refresh the
# serving sweep.  Serialized, one TPU process at a time.
cd /root/repo || exit 1
mkdir -p runs

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 7200 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

run_one cfv3_seed0 python -m attend_infer_repeat_tpu.train \
  --config canonical_fast --workdir runs/cfv3_seed0 --iters 60000 \
  --no-tensorboard
run_one cfv3_seed0_eval python scripts/eval_checkpoint.py \
  --config canonical_fast --workdir runs/cfv3_seed0 --batches 16

run_one uniform_v3 python -m attend_infer_repeat_tpu.train \
  --config canonical_uniform --workdir runs/uniform_v3 --iters 150000 \
  --no-tensorboard
run_one uniform_v3_eval python scripts/eval_checkpoint.py \
  --config canonical_uniform --workdir runs/uniform_v3 --batches 16

run_one serving_r3 python -m benchmarks.harness serving

echo "=== campaign r3b done ($(date +%H:%M:%S)) ==="
