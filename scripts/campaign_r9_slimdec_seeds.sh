#!/bin/bash
# Seed-robustness follow-on to campaign r8: the CPU pre-screen
# (runs/u28_cpu_slimdec, 2026-08-18) shows the 64-wide decoder holds
# 0.979-0.986 held-out count accuracy through the KL warmup where the
# shipped 256-wide preset declines to 0.93-0.95 (runs/u28v2_seed*), at
# ELBO parity — the capacity-channel hypothesis (scripts/probe_u28.py)
# confirmed on the early trajectory.  This campaign adds seeds 1/2 at
# r8's 60k length so the slimdec result is a 3-seed table, then evals.
# Waits for campaign_r8 to drain; one TPU process at a time.
cd /root/repo || exit 1
mkdir -p runs

if [ -f /tmp/campaign_r8.pid ]; then
  while kill -0 "$(cat /tmp/campaign_r8.pid)" 2>/dev/null; do sleep 60; done
fi

for s in 1 2; do
  echo "=== slimdec seed $s ($(date +%H:%M:%S)) ==="
  timeout 10800 python scripts/probe_u28.py --variant slimdec --seed "$s" \
    --iters 60000 > "runs/u28_probe_slimdec_s${s}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 1200 python scripts/eval_checkpoint.py \
    --config canonical_uniform28 --workdir "runs/u28_probe_slimdec_s${s}" \
    --model-set "decoder_hidden=(64,)" --train-seed "$s" --batches 16 \
    > "runs/u28_probe_slimdec_s${s}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
done

# Explain-away figure on the slimdec seed-0 model (r8's checkpoint)
timeout 1200 python scripts/make_explainaway_fig.py \
  --config canonical_uniform28 --workdir runs/u28_probe_slimdec \
  --model-set "decoder_hidden=(64,)" \
  --out docs/explain_away_u28_slimdec.png --min-iou 0.15 \
  > runs/u28_slimdec_fig.log 2>&1
echo "fig rc=$? ($(date +%H:%M:%S))"
echo "=== campaign r9 done ($(date +%H:%M:%S)) ==="
