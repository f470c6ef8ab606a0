#!/bin/bash
# Campaign r27: (1) train the k=5 importance-weighted objective
# (VIMCO; `iwae_trained` preset — VERDICT r3 next #6) and compare density
# vs the ELBO-trained `iwae` run via a k-sweep incl. IWAE-64;
# (2) k-sweep on the ELBO-trained checkpoint (VERDICT r3 next #8);
# (3) literal-regime `canonical` seed DISTRIBUTION: 5 fresh seeds x 150k
# (the ceiling is frozen by 5k, so 150k suffices — VERDICT r3 next #7).
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r27.log

# chain after campaign r28 (one TPU process at a time; the r28 benches
# are short and their evidence is wanted early, so they go first)
for _ in $(seq 2160); do
  grep -q "campaign r28 done" runs/campaign_r28.log 2>/dev/null && break
  sleep 10
done
echo "=== campaign r27 start ($(date +%H:%M:%S)) ===" >> "$log"

# ---- 0a. cheap items first: k-sweep on the ELBO-trained checkpoint ------
# (VERDICT r3 next #8 — bound monotonicity in k on runs/iwae_r5)
out="runs/iwae_r5_ksweep.log"
if [ -s "$out" ] && grep -q "monotone_in_k" "$out"; then
  echo "=== $out already complete, skipping ===" >> "$log"
else
  echo "=== ksweep iwae_r5 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 3600 python scripts/iwae_ksweep.py --config iwae \
    --workdir runs/iwae_r5 --ks 1 5 25 --batch-size 1024 --batches 8 \
    > "$out" 2>&1
  timeout 3600 python scripts/iwae_ksweep.py --config iwae \
    --workdir runs/iwae_r5 --ks 64 --batch-size 256 --batches 32 \
    >> "$out" 2>&1
  echo "ksweep rc=$? ($(date +%H:%M:%S))" >> "$log"
fi

# ---- 0b. literal-regime seed distribution (5 fresh seeds x 150k) --------
# (VERDICT r3 next #7; each run is ~4 min at batch 64)
for s in 2 3 4 5 6; do
  wd="runs/canonical_ref150k_seed$s"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; continue
  fi
  echo "=== $wd @150000 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 10800 python scripts/run_variant.py --config canonical \
    --workdir "$wd" --iters 150000 --train-set "seed=$s" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical \
    --workdir "$wd" --batch-size 1024 --batches 16 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
done

# ---- 1. VIMCO-trained IWAE objective, full budget -----------------------
wd=runs/iwae_trained_r1
if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
  echo "=== $wd already complete, skipping ===" >> "$log"
else
  echo "=== $wd @150000 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config iwae_trained \
    --workdir "$wd" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config iwae_trained \
    --workdir "$wd" --batch-size 1024 --batches 16 --iwae \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
fi

# ---- 2. k-sweep on the VIMCO-trained checkpoint (density comparison) ----
run=iwae_trained_r1
out="runs/${run}_ksweep.log"
if [ -s "$out" ] && grep -q "monotone_in_k" "$out"; then
  echo "=== $out already complete, skipping ===" >> "$log"
else
  echo "=== ksweep $run ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 3600 python scripts/iwae_ksweep.py --config iwae_trained \
    --workdir "runs/$run" --ks 1 5 25 --batch-size 1024 --batches 8 \
    > "$out" 2>&1
  timeout 3600 python scripts/iwae_ksweep.py --config iwae_trained \
    --workdir "runs/$run" --ks 64 --batch-size 256 --batches 32 \
    >> "$out" 2>&1
  echo "ksweep rc=$? ($(date +%H:%M:%S))" >> "$log"
fi

echo "=== campaign r27 done ($(date +%H:%M:%S)) ===" >> "$log"
