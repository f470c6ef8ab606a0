#!/bin/bash
# Campaign r20: serialized TPU queue behind campaign r19.
#
# Context: the r4 train_st grid (benchmarks/results.jsonl, 2026-08-19)
# measured the tuned Pallas ST kernel BEATING the XLA separable form at
# the headline batch size — 4.47 vs 5.86 ms at batch 1024 (block_b=32,
# bf16 + f32 decoder, the shipped dtype mixture).  That harness runs an
# unscanned/un-remat step, so the open question is whether the win
# survives composition with the shipped scan_steps=20 + remat driver.
# Also: the r4 hbm_roofline run produced a physically impossible STREAM
# peak (72-98 TB/s) from host-side timing through the remote-execution
# tunnel; scripts/hbm_roofline.py now times an on-device fori_loop, so
# the measured-peak denominator needs a clean re-run (VERDICT r3 #5).
#
# Queue:
#   1. hbm_roofline re-run with the on-device STREAM timing
#   2. canonical_fast verbatim headline (control, same session)
#   3. same preset + st_method=pallas, block_b in {32, 8}
#   4. gate: if the best Pallas point beats the control by >=3%, run a
#      60k-step quality validation at that exact config (the kernel is
#      numerics-parity-tested, but basin selection is dtype/op-order
#      sensitive here — see the all-bf16 fragility row in BASELINE.md)
cd /root/repo || exit 1
log=runs/campaign_r20.log

# Wait for campaign r19 to release the chip (poll the log marker: it
# survives this session and any respawn).
while ! grep -q "campaign r19 done" runs/campaign_r19.log 2>/dev/null; do
  sleep 60
done
echo "=== campaign r20 start ($(date +%H:%M:%S)) ===" >> "$log"

echo "--- 1. hbm_roofline (on-device STREAM) ---" >> "$log"
timeout 3600 python scripts/hbm_roofline.py > runs/hbm_roofline_r5.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

echo "--- 2. headline control (canonical_fast verbatim) ---" >> "$log"
timeout 1800 python bench.py > runs/bench_headline_r20.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

echo "--- 3. pallas headline probes ---" >> "$log"
timeout 1800 python bench.py --config canonical_fast \
  --st-method pallas --st-block-b 32 \
  > runs/bench_pallas_b32_r20.log 2>&1
echo "b32 rc=$? ($(date +%H:%M:%S))" >> "$log"
timeout 1800 python bench.py --config canonical_fast \
  --st-method pallas --st-block-b 8 \
  > runs/bench_pallas_b8_r20.log 2>&1
echo "b8 rc=$? ($(date +%H:%M:%S))" >> "$log"

val () {  # last headline JSON "value" in a log
  grep -o '"value": [0-9.]*' "$1" 2>/dev/null | tail -1 | grep -o '[0-9.]*$'
}
ctrl=$(val runs/bench_headline_r20.log)
p32=$(val runs/bench_pallas_b32_r20.log)
p8=$(val runs/bench_pallas_b8_r20.log)
best_m=""; best_v=$ctrl; best_b=0
for pair in "32:$p32" "8:$p8"; do
  b="${pair%%:*}"; v="${pair#*:}"
  [ -n "$v" ] || continue
  if python3 -c "import sys; sys.exit(0 if float('$v') > float('${best_v:-0}') * 1.03 else 1)"; then
    best_m="pallas"; best_v="$v"; best_b="$b"
  fi
done
echo "control=$ctrl pallas_b32=$p32 pallas_b8=$p8 -> winner=${best_m:-xla}@$best_v" >> "$log"

if [ "$best_m" = "pallas" ]; then
  echo "--- 4. pallas quality gate (60k, canonical_fast + st=pallas/b$best_b) ---" >> "$log"
  timeout 7200 python scripts/run_variant.py --config canonical_fast \
    --workdir runs/cf_pallas_seed0 --iters 60000 \
    --model-set "st_method='pallas'" --model-set "st_block_b=$best_b" \
    >> runs/cf_pallas_seed0.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical_fast \
    --workdir runs/cf_pallas_seed0 --batch-size 512 --batches 32 \
    > runs/cf_pallas_seed0_eval.log 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
else
  echo "(pallas did not beat the scanned control by >=3% — XLA stays the default)" >> "$log"
fi

echo "=== campaign r20 done ($(date +%H:%M:%S)) ===" >> "$log"
