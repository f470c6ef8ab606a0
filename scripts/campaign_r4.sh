#!/bin/bash
# Round-3 follow-on: retrain canonical_uniform28 (anneal-dose-tuned
# preset, see probe_u28.py prior2/priormild) on 3 seeds, eval final AND
# best-eval checkpoints, regenerate the forced-overlap explain-away
# figure from seed 0.  Waits for: the r3 campaign (/tmp/campaign.pid),
# the r3c probes (/tmp/probes_r3c.pid), and the preset-decision commit
# (/tmp/r4_preset_ready sentinel) so training picks up the tuned preset.
# Serialized — one TPU training process at a time.
cd /root/repo || exit 1
mkdir -p runs

for pidfile in /tmp/campaign.pid /tmp/probes_r3c.pid; do
  if [ -f "$pidfile" ]; then
    while kill -0 "$(cat "$pidfile")" 2>/dev/null; do sleep 60; done
  fi
done
while [ ! -f /tmp/r4_preset_ready ]; do sleep 30; done

run_one() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 10800 "$@" > "runs/${name}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
}

for s in 0 1 2; do
  run_one u28v2_seed$s python -m attend_infer_repeat_tpu.train \
    --config canonical_uniform28 --workdir runs/u28v2_seed$s --seed $s \
    --iters 100000 --no-tensorboard
  run_one u28v2_seed${s}_eval python scripts/eval_checkpoint.py \
    --config canonical_uniform28 --workdir runs/u28v2_seed$s \
    --train-seed $s --batches 16
  run_one u28v2_seed${s}_eval_best python scripts/eval_checkpoint.py \
    --config canonical_uniform28 --workdir runs/u28v2_seed$s \
    --train-seed $s --batches 16 --best
done

run_one u28v2_overlap_errors python scripts/analyze_overlap_errors.py \
  --config canonical_uniform28 --workdir runs/u28v2_seed0 --train-seed 0

run_one u28v2_fig python scripts/make_explainaway_fig.py \
  --config canonical_uniform28 --workdir runs/u28v2_seed0 \
  --out docs/explain_away_u28.png --min-iou 0.15

echo "=== campaign r4 done ($(date +%H:%M:%S)) ==="
