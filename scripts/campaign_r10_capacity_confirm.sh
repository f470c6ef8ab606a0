#!/bin/bash
# Re-run of the lost r8/r9 capacity-confirmation fleet (the host reset
# wiped runs/): TPU confirmation at 60k steps of the CPU pre-screen
# winners on the 28 px forced-overlap task (runs/u28_cpu_* showed
# what20 0.9908 / slimdec 0.9772 at 8k vs base declining to 0.941).
# Order: what20 seeds 0-2 (won both axes on the pre-screen), then
# what20prior5 (capacity fix + original harsh prior), then slimdec
# seeds 0-2, then the explain-away figure on what20 seed 0.
cd /root/repo || exit 1
mkdir -p runs

model_set() {
  case "$1" in
    slimdec)       echo "decoder_hidden=(64,)" ;;
    what20)        echo "n_what=20" ;;
    what20prior5)  echo "n_what=20" ;;
  esac
}

run_one() {
  v="$1"; s="$2"
  suffix=""; [ "$s" != 0 ] && suffix="_s${s}"
  wd="runs/u28_probe_${v}${suffix}"
  echo "=== $v seed $s ($(date +%H:%M:%S)) ==="
  timeout 7200 python scripts/probe_u28.py --variant "$v" --seed "$s" \
    --iters 60000 > "${wd}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 1200 python scripts/eval_checkpoint.py \
    --config canonical_uniform28 --workdir "$wd" \
    --model-set "$(model_set "$v")" --train-seed "$s" --batches 16 \
    > "${wd}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
}

for s in 0 1 2; do run_one what20 "$s"; done
run_one what20prior5 0
for s in 0 1 2; do run_one slimdec "$s"; done

timeout 1200 python scripts/make_explainaway_fig.py \
  --config canonical_uniform28 --workdir runs/u28_probe_what20 \
  --model-set "n_what=20" \
  --out docs/explain_away_u28_what20.png --min-iou 0.15 \
  > runs/u28_what20_fig.log 2>&1
echo "fig rc=$? ($(date +%H:%M:%S))"
echo "=== campaign r10 done ($(date +%H:%M:%S)) ==="
