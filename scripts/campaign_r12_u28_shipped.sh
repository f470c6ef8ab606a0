#!/bin/bash
# Validate the shipped canonical_uniform28 preset (n_what=20 capacity
# fix) at its full 150k-step budget: the r10 probe evidence is 60k-step
# runs (lr fully decayed by 60k, prior anneal done at 42k, so little
# should change) — this run confirms no late-training instability and
# produces the shipped-preset headline artifact.  Chained after
# campaign r11 (one TPU training process at a time).
cd /root/repo || exit 1
mkdir -p runs

if [ -f /tmp/campaign_r11.pid ]; then
  while kill -0 "$(cat /tmp/campaign_r11.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== u28 shipped-preset 150k seed 0 ($(date +%H:%M:%S)) ==="
timeout 10800 python -m attend_infer_repeat_tpu.train \
  --config canonical_uniform28 --workdir runs/u28_shipped_seed0 \
  --seed 0 --no-tensorboard > runs/u28_shipped_seed0.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))"
timeout 2400 python scripts/eval_checkpoint.py --config canonical_uniform28 \
  --workdir runs/u28_shipped_seed0 --train-seed 0 --batches 16 \
  > runs/u28_shipped_seed0_eval.log 2>&1
echo "eval rc=$? ($(date +%H:%M:%S))"
echo "=== campaign r12 done ($(date +%H:%M:%S)) ==="
