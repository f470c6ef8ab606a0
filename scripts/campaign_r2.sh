#!/bin/bash
# Round-2 measurement campaign, phase 1 (v2 — max_scale recipe):
# 3-seed canonical_fast + reference-style uniform placement, each with a
# 16k-image held-out evaluation.  Serialized — one TPU process at a time.
cd /root/repo || exit 1
mkdir -p runs

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 5400 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

for s in 0 1 2; do
  run_one cfv2_seed$s python scripts/run_variant.py --config canonical_fast \
    --workdir runs/cfv2_seed$s --train-set "seed=$s" --iters 60000
  run_one cfv2_seed${s}_eval python scripts/eval_checkpoint.py \
    --config canonical_fast --workdir runs/cfv2_seed$s --train-seed $s \
    --batches 16
done

run_one uniform python scripts/run_variant.py --config canonical_uniform \
  --workdir runs/uniform_r2
run_one uniform_eval python scripts/eval_checkpoint.py \
  --config canonical_uniform --workdir runs/uniform_r2 --batches 16

echo "=== phase 1 done ($(date +%H:%M:%S)) ==="
