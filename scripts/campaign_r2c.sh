#!/bin/bash
# Round-2 measurement campaign, phase 3: performance benchmarks.
# Pallas-vs-XLA full train step (VERDICT #5), ST kernel sweep, train
# throughput + batch sweep, serving sweep, headline bench with MFU (#7).
cd /root/repo || exit 1
mkdir -p runs

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 3600 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

# crowded rerun without the (collapse-inducing) window cap — replaces
# the killed runs/crowded_r2; floor-free eval vs round-1's 0.84
run_one crowded_nocap python scripts/run_variant.py --config crowded \
  --workdir runs/crowded_nocap
run_one crowded_nocap_eval python scripts/eval_checkpoint.py \
  --config crowded --workdir runs/crowded_nocap --batch-size 512 --batches 16

# late-added ablation: slower anneal at the literal reference regime
run_one ablate_ref_anneal python scripts/ablate_canonical.py \
  --variant ref+anneal --iters 150000

run_one bench_train_st python -m benchmarks.harness train_st
run_one bench_st python -m benchmarks.harness st
run_one bench_train python -m benchmarks.harness train
run_one bench_serving python -m benchmarks.harness serving
for b in 1024 2048 4096 8192; do
  run_one bench_b$b python bench.py --batch-size $b
done
run_one bench_headline python bench.py

echo "=== phase 3 done ($(date +%H:%M:%S)) ==="
