#!/bin/bash
# Campaign r51 (round 5, final): seed depth at the r5 shipped point so
# no flipped preset's quality row rests on one seed.
cd /root/repo || exit 1
mkdir -p runs
log=runs/campaign_r51.log
echo "=== campaign r51 start ($(date +%H:%M:%S)) ===" >> "$log"

train_eval () {  # workdir config extra-args...
  local wd="$1" cfg="$2"; shift 2
  if [ -s "${wd}_eval.log" ] && grep -q '"count_accuracy"' "${wd}_eval.log"; then
    echo "=== $wd already complete, skipping ===" >> "$log"; return
  fi
  echo "=== $wd ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 7200 python scripts/run_variant.py --config "$cfg" \
    --workdir "$wd" "$@" >> "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -c "basin-restart" "${wd}.log" | xargs -I{} echo "restarts fired: {}" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config "$cfg" \
    --workdir "$wd" --batch-size 1024 --batches 16 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "${wd}_eval.log" | tail -1 >> "$log"
  grep -o '"elbo": [0-9.]*' "${wd}_eval.log" | head -1 >> "$log"
}

train_eval runs/u28v7_seed1    canonical_uniform28 --train-set "seed=1"
train_eval runs/u28v7_seed2    canonical_uniform28 --train-set "seed=2"
train_eval runs/uniform_v6_s1  canonical_uniform   --train-set "seed=1"

for s in 1 2; do
  out="runs/u28v7_seed${s}_eval_best.log"
  if [ -s "$out" ] && grep -q '"count_accuracy"' "$out"; then continue; fi
  echo "=== u28v7_seed$s best-ckpt eval ($(date +%H:%M:%S)) ===" >> "$log"
  timeout 2400 python scripts/eval_checkpoint.py --config canonical_uniform28 \
    --workdir "runs/u28v7_seed$s" --batch-size 1024 --batches 16 --best \
    > "$out" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))" >> "$log"
  grep -o '"count_accuracy_mode": [0-9.]*' "$out" | tail -1 >> "$log"
done

echo "=== campaign r51 done ($(date +%H:%M:%S)) ===" >> "$log"
