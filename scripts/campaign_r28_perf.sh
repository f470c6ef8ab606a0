#!/bin/bash
# Campaign r28: round-4 perf experiments on the headline step.
#
# 1. Headline control at HEAD — the byte-diet changes (image out of the
#    scan carry via nn.broadcast; baseline split-input first layer that
#    kills the (B,T,2565) concat staging) vs the r3 control 454.0k img/s.
# 2. remat_policy=save_st on the XLA backend (does saving the ST outputs
#    help the separable form too?)
# 3. The decisive Pallas×remat experiment (VERDICT r3 next #5): tuned
#    Pallas kernel under the shipped scan+remat driver WITH the save_st
#    policy, so the backward reuses the pallas_call results instead of
#    rematerializing through the kernel boundary (the r20 loss mode).
# 4. Crowded-preset bench (VERDICT r3 next #3 done criterion: >=130k).
# 5. byte_map after-picture for BASELINE.md.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r28.log

# chain after campaign r26 (one TPU process at a time)
for _ in $(seq 2160); do
  grep -q "campaign r26 done" runs/campaign_r26.log 2>/dev/null && break
  sleep 10
done
echo "=== campaign r28 start ($(date +%H:%M:%S)) ===" >> "$log"

bench_point () {  # name args...
  local name="$1"; shift
  local out="runs/bench_${name}_r28.log"
  if [ -s "$out" ] && grep -q '"metric"' "$out"; then
    echo "=== $name already measured, skipping ===" >> "$log"; return
  fi
  echo "=== bench $name: $* ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 2400 python bench.py "$@" > "$out" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"value": [0-9.]*' "$out" | head -1 >> "$log"
}

bench_point headline
bench_point headline2
bench_point crowded       --config crowded
bench_point xla_savest    --config canonical_fast --remat-policy save_st
bench_point pallas_b32            --config canonical_fast --st-method pallas --st-block-b 32
bench_point pallas_b32_savest     --config canonical_fast --st-method pallas --st-block-b 32 --remat-policy save_st
bench_point pallas_b8_savest      --config canonical_fast --st-method pallas --st-block-b 8  --remat-policy save_st

echo "=== byte_map after ($(date +%H:%M:%S)) ===" >> "$log"
if [ ! -s runs/byte_map_r4_after.json ]; then
  timeout 2400 python scripts/byte_map.py --config canonical_fast --top 25 \
    --out runs/byte_map_r4_after.json > runs/byte_map_r4_after.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
fi

echo "=== campaign r28 done ($(date +%H:%M:%S)) ===" >> "$log"
