#!/bin/bash
# Resume of campaign_r3.sh (the driver session died at u28_seed0 ~51k/150k)
# followed by campaign_r3b.sh.  u28_seed0 resumes from its latest orbax
# checkpoint (train loop is restore-or-init); its pre-crash log is kept as
# runs/u28_seed0.log and the resumed tail goes to runs/u28_seed0_resume.log.
# Serialized — one TPU process at a time.
cd /root/repo || exit 1
mkdir -p runs

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 10800 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

run_one u28_seed0_resume python -m attend_infer_repeat_tpu.train \
  --config canonical_uniform28 --workdir runs/u28_seed0 --seed 0 \
  --no-tensorboard
run_one u28_seed0_eval python scripts/eval_checkpoint.py \
  --config canonical_uniform28 --workdir runs/u28_seed0 --train-seed 0 \
  --batches 16

for s in 1 2; do
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

# --- campaign_r3b: re-validate cap-using flagship presets at HEAD ---
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

echo "=== campaign r3_resume done ($(date +%H:%M:%S)) ==="
