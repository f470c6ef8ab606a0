#!/bin/bash
# Campaign r36: HEAD-preset-verbatim quality refresh, queued behind r35.
# The committed quality rows for u28, iwae, and single_digit were trained
# at a pre-save_st / pre-scan50 HEAD.  scan_steps is bit-exact, but
# remat_policy="save_st" is only bit-CLOSE — 150k trajectories are
# chaotic in build revision (demonstrated by cfv5_seed2: 1.000-family
# probes -> 0.7515 at the post-save_st HEAD).  Re-run one seed of each at
# the preset verbatim (now scan50 + detector) so every headline row has a
# living artifact at the shipped numerics point, plus canonical_fast
# seeds 3/4 to deepen the detector-procedure evidence.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r36.log

while ! grep -q "campaign r35 done" runs/campaign_r35.log 2>/dev/null; do
  sleep 30
done
echo "=== campaign r36 start ($(date +%H:%M:%S)) ===" >> "$log"

train_eval () {  # workdir config eval_batch eval_batches extra-args...
  local wd="$1" cfg="$2" eb="$3" en="$4"; shift 4
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 14400 python scripts/run_variant.py --config "$cfg" \
    --workdir "$wd" "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" "${wd}.log" | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --batch-size "$eb" --batches "$en" \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
}

train_eval runs/u28v6_seed0      canonical_uniform28 1024 16 --train-set "seed=0"
train_eval runs/iwae_r7          iwae                1024 16 --train-set "seed=0"
train_eval runs/single_digit_r4  single_digit        1024 16 --train-set "seed=0"
train_eval runs/cfv5det_seed3    canonical_fast      1024 16 --train-set "seed=3"
train_eval runs/cfv5det_seed4    canonical_fast      1024 16 --train-set "seed=4"

echo "=== campaign r36 done ($(date +%H:%M:%S)) ===" >> "$log"
