#!/bin/bash
# Campaign r42 (round 5): the short-experiment tail, queued behind r41.
#   1. cfv5det_seed5 retry (r39's attempt hit a mid-edit import race).
#   2. Canvas-carry byte experiment (VERDICT r5 #5): bench + byte map of
#      canvas_rebuild=True + bf16 carry vs HEAD control, then a FULL
#      150k canonical_fast run at the variant for the quality gate.
#   3. Serving-infer saturation profile (VERDICT r5 #6): full-program
#      plain-vs-tiled scaling + per-component decomposition.
#   4. Compile-cliff curve (VERDICT r5 #4): compile time vs scan_steps,
#      then remat isolations at K=100.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r42.log

while ! grep -q "campaign r41 done" runs/campaign_r41.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r42 start ($(date +%H:%M:%S)) ===" >> "$log"

# ---- 1. cfv5det_seed5 retry ------------------------------------------
if ! { [ -s runs/cfv5det_seed5_eval.log ] && grep -q '"count_accuracy"' runs/cfv5det_seed5_eval.log; }; then
  echo "=== runs/cfv5det_seed5 retry ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config canonical_fast \
    --workdir runs/cfv5det_seed5 --train-set "seed=5" \
    >> runs/cfv5det_seed5.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" runs/cfv5det_seed5.log | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical_fast \
    --workdir runs/cfv5det_seed5 --batch-size 1024 --batches 16 \
    > runs/cfv5det_seed5_eval.log 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' runs/cfv5det_seed5_eval.log | tail -1 >> "$log"
fi

# ---- 2. canvas-carry byte experiment ---------------------------------
echo "=== canvas bench control ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1200 python bench.py --config canonical_fast \
  > runs/bench_canvas_control.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
echo "=== canvas bench rebuild+bf16 ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1200 python bench.py --config canonical_fast \
  --model-set "canvas_rebuild=True" \
  --model-set "canvas_carry_dtype='bfloat16'" \
  > runs/bench_canvas_rebuild.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
echo "=== canvas bench rebuild-only (f32 carry) ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1200 python bench.py --config canonical_fast \
  --model-set "canvas_rebuild=True" \
  > runs/bench_canvas_rebuild_f32.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
for f in runs/bench_canvas_control.log runs/bench_canvas_rebuild.log runs/bench_canvas_rebuild_f32.log; do
  grep -o '"value": [0-9.]*' "$f" | head -1 | xargs -I{} echo "$f {}" >> "$log"
done

echo "=== canvas byte map ($(date +%H:%M:%S)) ===" >> "$log"
timeout 1800 python scripts/byte_map.py --config canonical_fast \
  --model-set "canvas_rebuild=True" \
  --model-set "canvas_carry_dtype='bfloat16'" \
  --out runs/byte_map_canvas_rebuild.json \
  > runs/byte_map_canvas_rebuild.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

# quality gate: full preset run at the variant (cheap at ~15 min and
# stronger than a 6k probe)
if ! { [ -s runs/cf_canvas_rebuild_s0_eval.log ] && grep -q '"count_accuracy"' runs/cf_canvas_rebuild_s0_eval.log; }; then
  echo "=== runs/cf_canvas_rebuild_s0 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config canonical_fast \
    --workdir runs/cf_canvas_rebuild_s0 \
    --model-set "canvas_rebuild=True" \
    --model-set "canvas_carry_dtype='bfloat16'" \
    >> runs/cf_canvas_rebuild_s0.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical_fast \
    --workdir runs/cf_canvas_rebuild_s0 --batch-size 1024 --batches 16 \
    --model-set "canvas_rebuild=True" \
    --model-set "canvas_carry_dtype='bfloat16'" \
    > runs/cf_canvas_rebuild_s0_eval.log 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' runs/cf_canvas_rebuild_s0_eval.log | tail -1 >> "$log"
fi

# ---- 3. serving-infer profile ----------------------------------------
echo "=== profile_infer ($(date +%H:%M:%S)) ===" >> "$log"
timeout 3600 python scripts/profile_infer.py > runs/profile_infer.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

# ---- 4. compile cliff -------------------------------------------------
cliff () {  # label timeout args...
  local lbl="$1" to="$2"; shift 2
  echo "=== compile_cliff $lbl ($(date +%H:%M:%S)) ===" >> "$log"
  timeout "$to" python scripts/compile_cliff.py "$@" \
    >> runs/compile_cliff.log 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
}
: > runs/compile_cliff.log
cliff k10  900  --scan-steps 10
cliff k25  1200 --scan-steps 25
cliff k50  1500 --scan-steps 50
cliff k75  1800 --scan-steps 75
cliff k100_norematnodonate 1200 --scan-steps 100 --no-remat --no-donate
cliff k100_noremat 1200 --scan-steps 100 --no-remat
cliff k100_full    1800 --scan-steps 100 --remat-policy full
cliff k100_nodonate 1800 --scan-steps 100 --no-donate

echo "=== campaign r42 done ($(date +%H:%M:%S)) ===" >> "$log"
