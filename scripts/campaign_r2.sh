#!/bin/bash
# Round-2 measurement campaign, phase 1: quality runs (serialized — one
# TPU process at a time).  Each run logs to runs/<name>.log; final
# held-out evaluation via scripts/eval_checkpoint.py appended to the log.
cd /root/repo || exit 1
mkdir -p runs

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 5400 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

run_one cf_seed0 python scripts/run_variant.py --config canonical_fast \
  --workdir runs/cf_seed0 --train-set "seed=0"
run_one cf_seed0_eval python scripts/eval_checkpoint.py --config canonical_fast \
  --workdir runs/cf_seed0 --train-seed 0 --batches 16

run_one cf_seed1 python scripts/run_variant.py --config canonical_fast \
  --workdir runs/cf_seed1 --train-set "seed=1"
run_one cf_seed1_eval python scripts/eval_checkpoint.py --config canonical_fast \
  --workdir runs/cf_seed1 --train-seed 1 --batches 16

run_one cf_seed2 python scripts/run_variant.py --config canonical_fast \
  --workdir runs/cf_seed2 --train-set "seed=2"
run_one cf_seed2_eval python scripts/eval_checkpoint.py --config canonical_fast \
  --workdir runs/cf_seed2 --train-seed 2 --batches 16

run_one uniform python scripts/run_variant.py --config canonical_uniform \
  --workdir runs/uniform_r2
run_one uniform_eval python scripts/eval_checkpoint.py --config canonical_uniform \
  --workdir runs/uniform_r2 --batches 16

echo "=== phase 1 done ($(date +%H:%M:%S)) ==="
