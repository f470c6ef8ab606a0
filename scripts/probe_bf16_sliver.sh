#!/bin/bash
# Probes for the bf16 seed-0 over-split (sliver-window) optimum
# (runs/iwae_r4 + runs/cfv5_seed0: 0.947 via 2->3 splits; f32 seed 0 = 1.000).
#
# P1  f32 fine-tune tail from the stuck 150k checkpoint: if f32 gradients
#     prune the sliver, the optimum is sustained by bf16 gradient
#     quantization, not by the true objective.
# P2a seed-0 retrain, default bf16 + the new f32 sigmoid/pixel path
#     (decoder matmuls still bf16).
# P2b seed-0 retrain, decoder_dtype=float32 (crisp generative-path
#     gradients; inference net stays bf16).
# Stuck signature appears by 20-30k (0.886 eval plateau vs 1.0).
cd /root/repo || exit 1

echo "=== P1 f32-tail ($(date +%H:%M:%S)) ==="
mkdir -p runs/probe_f32tail
cp -r runs/iwae_r4/ckpt runs/probe_f32tail/ 2>/dev/null
timeout 3600 python -m attend_infer_repeat_tpu.train --config iwae \
  --workdir runs/probe_f32tail --iters 160000 --seed 0 --dtype float32 \
  --no-tensorboard > runs/probe_f32tail.log 2>&1
echo "P1 rc=$? ($(date +%H:%M:%S))"
timeout 1200 python scripts/eval_checkpoint.py --config iwae \
  --workdir runs/probe_f32tail --train-seed 0 --batches 16 \
  --model-set "dtype='float32'" > runs/probe_f32tail_eval.log 2>&1
echo "P1 eval rc=$? ($(date +%H:%M:%S))"

echo "=== P2a bf16 + f32 pixels ($(date +%H:%M:%S)) ==="
timeout 3600 python -m attend_infer_repeat_tpu.train --config canonical_fast \
  --workdir runs/probe_bf16_f32pix --iters 30000 --seed 0 \
  --no-tensorboard > runs/probe_bf16_f32pix.log 2>&1
echo "P2a rc=$? ($(date +%H:%M:%S))"

echo "=== P2b f32 decoder ($(date +%H:%M:%S)) ==="
timeout 3600 python scripts/run_variant.py --config canonical_fast \
  --workdir runs/probe_bf16_f32dec --iters 30000 \
  --model-set "decoder_dtype='float32'" \
  > runs/probe_bf16_f32dec.log 2>&1
echo "P2b rc=$? ($(date +%H:%M:%S))"

echo "=== probes done ($(date +%H:%M:%S)) ==="
