#!/bin/bash
# Basin-selection probes for the bf16 seed-0 over-split (sliver) optimum.
#
# Established so far (runs/, BASELINE.md):
#   - bf16 seed 0 lands in a 2->3 over-split basin (0.886 by 5k, ~0.94
#     at 150k); f32 seed 0 reaches 1.000 by 5k.  The divergence is
#     visible at step 1000 (0.690 vs 0.917), so a 6k probe decides.
#   - P1 (f32 fine-tune of the stuck 150k checkpoint): stays ~0.949 ->
#     the sliver is a genuine local optimum; bf16 *finds* it, doesn't
#     sustain it.
#   - P2a (f32 sigmoid/pixel path, now default): trajectory identical to
#     4 decimals -> refuted (logits were already effectively f32-rounded).
#
# This script isolates WHERE bf16 steers the early trajectory:
#   B1 decoder_dtype='float32'  (f32 generative matmuls, bf16 inference)
#   B2 inverse: dtype='float32' + decoder_dtype='bfloat16'
#   B3/B4 bf16 seeds 2,3 (basin frequency across seeds; r15: seed1 good)
cd /root/repo || exit 1
mkdir -p runs

probe() {
  wd="$1"; shift
  echo "=== $wd ($(date +%H:%M:%S)) ==="
  timeout 1200 python scripts/run_variant.py --config canonical_fast \
    --workdir "runs/$wd" --iters 6000 --no-checkpoints "$@" \
    > "runs/${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  python - "$wd" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(f'runs/{sys.argv[1]}/metrics.jsonl')]
ev = [r for r in rows if r.get('split')=='eval' and 'count_accuracy' in r]
print(sys.argv[1], [(r['step'], round(r['count_accuracy'],4)) for r in ev])
EOF
}

probe probe_b1_decf32 --model-set "decoder_dtype='float32'"
probe probe_b2_inverse --model-set "dtype='float32'" --model-set "decoder_dtype='bfloat16'"
probe probe_b3_seed2 --train-set "seed=2"
probe probe_b4_seed3 --train-set "seed=3"
echo "=== basin probes done ($(date +%H:%M:%S)) ==="
