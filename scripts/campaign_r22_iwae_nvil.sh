#!/bin/bash
# Campaign r22: repair the two config-4 evidence gaps found by the r5
# BASELINE audit.  Chains after campaign r21 (one TPU process at a time).
#
#   1. iwae_r5 — `runs/iwae_r4` was rebuilt BEFORE decoder_dtype=f32
#      shipped (its config echo has no decoder_dtype field) and landed in
#      the documented all-bf16 seed-0 bad basin (0.9472 held-out, same
#      basin as cfv5_seed0_allbf16).  Re-run `--config iwae` VERBATIM at
#      HEAD; expectation from cfv5_seed0 (same recipe + the knob): 1.0000.
#   2. no_nvil_r2 — the baseline-ablation collapse evidence
#      (runs/iwae_r2: 0.77 @59k then all-steps-on collapse by 120k) was
#      lost to host resets.  Re-run `--config no_nvil` verbatim; the
#      FINDING is the collapse trajectory in metrics.jsonl, so eval is
#      informational.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r22.log

# Wait for campaign r21 to release the TPU (up to 2h).
for _ in $(seq 720); do
  grep -q "campaign r21 done" runs/campaign_r21.log 2>/dev/null && break
  sleep 10
done
echo "=== campaign r22 start ($(date +%H:%M:%S)) ===" >> "$log"

run_one () {  # workdir config iters [eval-extra...]
  local wd="runs/$1" cfg="$2" iters="$3"; shift 3
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($cfg @$iters) ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config "$cfg" \
    --workdir "$wd" --iters "$iters" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --batch-size 1024 --batches 16 "$@" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
}

run_one iwae_r5 iwae 150000 --iwae
run_one no_nvil_r2 no_nvil 120000

echo "=== campaign r22 done ($(date +%H:%M:%S)) ===" >> "$log"
