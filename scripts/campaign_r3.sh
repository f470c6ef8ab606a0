#!/bin/bash
# Round-3 measurement campaign (VERDICT r2 #2/#3 + ADVICE r1 rerun):
#   1. canonical_uniform28 (28 px rescaled digits, forced overlap) x 3 seeds
#      + 16k-image held-out eval each
#   2. the fixed `iwae` preset (NVIL baseline ON, in-loop k=5 bound logging)
#      + held-out eval with the IWAE bound
#   3. floor-free ref+anneal ablation rerun (the confounded row's retrial)
# Serialized — one TPU process at a time.
cd /root/repo || exit 1
mkdir -p runs

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 7200 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

for s in 0 1 2; do
  run_one u28_seed$s python -m attend_infer_repeat_tpu.train \
    --config canonical_uniform28 --workdir runs/u28_seed$s --seed $s \
    --no-tensorboard
  run_one u28_seed${s}_eval python scripts/eval_checkpoint.py \
    --config canonical_uniform28 --workdir runs/u28_seed$s --train-seed $s \
    --batches 16
done

run_one iwae_r3 python -m attend_infer_repeat_tpu.train --config iwae \
  --workdir runs/iwae_r3 --no-tensorboard
run_one iwae_r3_eval python scripts/eval_checkpoint.py --config iwae \
  --workdir runs/iwae_r3 --batches 16 --iwae

run_one ablate_ref_anneal_v2 python scripts/ablate_canonical.py \
  --variant ref+anneal --iters 150000 --workdir runs/ablate_ref_anneal_v2

echo "=== campaign r3 done ($(date +%H:%M:%S)) ==="
