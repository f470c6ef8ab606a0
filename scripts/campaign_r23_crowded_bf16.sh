#!/bin/bash
# Campaign r23: does the benched operating point WIN on the crowded
# preset?  (VERDICT r3 #1 asked for the preset flip "and `crowded` if it
# wins there" — canonical_fast/uniform/u28/iwae flipped with evidence,
# crowded still ships f32 + scan_steps=1 + no remat.)
#
# Probe: crowded + {dtype=bf16, decoder_dtype=f32, remat, scan_steps=20}
# on seeds 0/1 at the full 150k budget (the shipped 100k gentle anneal is
# inherited), plus throughput controls of both operating points.
# Gate for flipping the preset: both seeds >= the f32 evidence (1.0000 /
# 0.9916) minus noise, i.e. >= 0.99.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r23.log

# Wait for campaign r22 to release the TPU (up to 3h).
for _ in $(seq 1080); do
  grep -q "campaign r22 done" runs/campaign_r22.log 2>/dev/null && break
  sleep 10
done
echo "=== campaign r23 start ($(date +%H:%M:%S)) ===" >> "$log"

# --- throughput: crowded preset verbatim (f32 control) vs bf16 point ---
echo "--- bench crowded control ($(date +%H:%M:%S)) ---" >> "$log"
timeout 1800 python bench.py --config crowded \
  > runs/bench_crowded_f32.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
echo "--- bench crowded bf16+scan20+remat ($(date +%H:%M:%S)) ---" >> "$log"
timeout 1800 python bench.py --config crowded --dtype bfloat16 \
  --scan-steps 20 --remat \
  > runs/bench_crowded_bf16.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))" >> "$log"

run_probe () {  # name, seed
  local wd="runs/$1" seed="$2"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd @150000 ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config crowded \
    --workdir "$wd" --iters 150000 \
    --model-set "dtype='bfloat16'" --model-set "decoder_dtype='float32'" \
    --model-set "remat=True" \
    --train-set "scan_steps=20" --train-set "seed=$seed" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 16 \
    --model-set "dtype='bfloat16'" --model-set "decoder_dtype='float32'" \
    --model-set "remat=True" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
}

run_probe crowded_bf16_seed0 0
run_probe crowded_bf16_seed1 1

echo "=== campaign r23 done ($(date +%H:%M:%S)) ===" >> "$log"
