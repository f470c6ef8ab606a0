#!/bin/bash
# Campaign r34: crowded bf16 operating-point seed depth, queued behind
# campaign r33.  The r31/r32 probes (seed0 = the r23-gated collapse
# seed, fresh seeds 20/21) decide whether the crowded preset un-gates
# bf16; this adds the historical frozen-basin seed (2) and one more
# fresh seed (22) at the same explicit point so the flip (or the
# refreshed gate) rests on 5 bf16 seeds, not 3.  Explicit --model-set
# flags rather than the preset so the runs mean the same thing whether
# or not the preset has been flipped by the time they start.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r34.log

while ! grep -q "campaign r33 done" runs/campaign_r33.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r34 start ($(date +%H:%M:%S)) ===" >> "$log"

probe () {  # workdir seed
  local wd="$1" seed="$2"
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config crowded \
    --workdir "$wd" \
    --model-set "dtype='bfloat16'" --model-set "decoder_dtype='float32'" \
    --model-set "remat=True" --model-set "remat_policy='save_st'" \
    --train-set "seed=$seed" \
    >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config crowded \
    --workdir "$wd" --batch-size 512 --batches 32 \
    --model-set "dtype='bfloat16'" --model-set "decoder_dtype='float32'" \
    --model-set "remat=True" --model-set "remat_policy='save_st'" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

probe runs/crowded_bf16det_seed2  2
probe runs/crowded_bf16det_seed22 22

echo "=== campaign r34 done ($(date +%H:%M:%S)) ===" >> "$log"
