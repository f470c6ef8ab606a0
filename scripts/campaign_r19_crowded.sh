#!/bin/bash
# Campaign r19: rerun the two crashed r17 bench legs (fixed code), then
# crowded-preset stabilization probes.
#
# Context: campaign r18 measured the crowded basin distribution at the
# shipped preset — seeds 0/1/2 land 0.9083/0.8181/0.8441 held-out vs the
# historical 0.9851 claim (artifacts lost), and the n_what=20 capacity
# probe (0.8495) does NOT transfer from u28.  The r18 trajectories show
# saturated plateaus (eval accuracy frozen to 3 decimals for 40k+ steps,
# discrete jumps between merge optima) and E[n]=2.1-2.37 vs true 2.5 —
# dense 4-5 digit scenes get merged.  Each extra step at the annealed
# 1e-5 endpoint costs ~11.5 nats of count KL; the u28 dose response
# showed a softer endpoint (1e-3, ~6.9 nats/step) relieves exactly this
# pressure.  Probes (each ~15 min at 150k steps):
#   1. final_success_prob=1e-3, seed 0   -> the u28 dose-response fix
#   2. anneal_steps=100000, seed 0       -> gentler approach to the same
#      endpoint (tests path-dependence of the basin selection)
#   3. seeds 3, 4 at the shipped preset  -> widen the basin sample
#   4. gate: if the best probe >= 0.95, re-run it on a second seed
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r19.log
echo "=== campaign r19 start ($(date +%H:%M:%S)) ===" >> "$log"

# --- 1. HBM roofline (r17 leg crashed on the n_warmup=0 bench bug;
#        stream microbench now chains the carry so the remote-execution
#        cache cannot fake 103 TB/s) ---
echo "--- hbm_roofline ($(date +%H:%M:%S)) ---" >> "$log"
timeout 2400 python scripts/hbm_roofline.py > runs/hbm_roofline_r4.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

# --- 2. Pallas train_st grid (r17 leg died on the block_b=128 scoped-
#        VMEM OOM; grid points now record errors instead of crashing) ---
echo "--- train_st grid ($(date +%H:%M:%S)) ---" >> "$log"
timeout 5400 python -m benchmarks.harness train_st \
  > runs/bench_train_st_r4.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

# --- 3. crowded probes ---
run_probe () {  # name, extra run_variant args...
  local wd="runs/$1"; shift
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd @150000 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config crowded \
    --workdir "$wd" --iters 150000 "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 16 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
}

run_probe crowded_p3_seed0 --prior-set "final_success_prob=1e-3"
run_probe crowded_slow_seed0 --prior-set "anneal_steps=100000"
run_probe crowded_r3_seed3 --train-set "seed=3"
run_probe crowded_r3_seed4 --train-set "seed=4"

# Gate: seed-robustness leg for the best probe if it clears 0.95.
best=""; best_acc=0
for wd in runs/crowded_p3_seed0 runs/crowded_slow_seed0; do
  acc=$(grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" 2>/dev/null \
        | tail -1 | grep -o '[0-9.]*$')
  [ -n "$acc" ] || continue
  if python3 -c "import sys; sys.exit(0 if float('$acc') > float('$best_acc') else 1)"; then
    best="$wd"; best_acc="$acc"
  fi
done
echo "best probe: ${best:-none} at ${best_acc}" >> "$log"
if [ -n "$best" ] && python3 -c "import sys; sys.exit(0 if float('$best_acc') >= 0.95 else 1)"; then
  case "$best" in
    *p3*)   run_probe crowded_p3_seed1 --prior-set "final_success_prob=1e-3" --train-set "seed=1" ;;
    *slow*) run_probe crowded_slow_seed1 --prior-set "anneal_steps=100000" --train-set "seed=1" ;;
  esac
else
  echo "(no probe cleared 0.95 — skipping the seed-robustness leg)" >> "$log"
fi

echo "=== campaign r19 done ($(date +%H:%M:%S)) ===" >> "$log"
