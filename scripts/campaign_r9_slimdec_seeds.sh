#!/bin/bash
# Seed-robustness follow-on to campaign r8.  The CPU pre-screen during
# the tunnel outage (runs/u28_cpu_*, 2026-08-18) confirmed the
# capacity-channel hypothesis on the early trajectory — held-out count
# accuracy at step 8k (base declines to 0.941 over the same window,
# runs/u28v2_seed*):
#   what20  (n_what 50->20)          0.9908   ELBO 2300 (+26 vs base)
#   slimdec (decoder 256->64)        0.9772   ELBO 2274 (parity)
# what20 wins BOTH axes, so it gets the seed sweep first; slimdec
# seeds follow if the chip stays up.  60k steps matches r8's length so
# each variant ends as a 3-seed table.  Waits for campaign_r8 to drain;
# one TPU process at a time.
cd /root/repo || exit 1
mkdir -p runs

if [ -f /tmp/campaign_r8.pid ]; then
  while kill -0 "$(cat /tmp/campaign_r8.pid)" 2>/dev/null; do sleep 60; done
fi

model_set() {
  case "$1" in
    slimdec) echo "decoder_hidden=(64,)" ;;
    what20)  echo "n_what=20" ;;
  esac
}

for v in what20 slimdec; do
  for s in 1 2; do
    echo "=== $v seed $s ($(date +%H:%M:%S)) ==="
    timeout 10800 python scripts/probe_u28.py --variant "$v" --seed "$s" \
      --iters 60000 > "runs/u28_probe_${v}_s${s}.log" 2>&1
    echo "rc=$? ($(date +%H:%M:%S))"
    timeout 1200 python scripts/eval_checkpoint.py \
      --config canonical_uniform28 --workdir "runs/u28_probe_${v}_s${s}" \
      --model-set "$(model_set "$v")" --train-seed "$s" --batches 16 \
      > "runs/u28_probe_${v}_s${s}_eval.log" 2>&1
    echo "eval rc=$? ($(date +%H:%M:%S))"
  done
done

# Explain-away figure on the what20 seed-0 model (r8's checkpoint)
timeout 1200 python scripts/make_explainaway_fig.py \
  --config canonical_uniform28 --workdir runs/u28_probe_what20 \
  --model-set "n_what=20" \
  --out docs/explain_away_u28_what20.png --min-iou 0.15 \
  > runs/u28_what20_fig.log 2>&1
echo "fig rc=$? ($(date +%H:%M:%S))"
echo "=== campaign r9 done ($(date +%H:%M:%S)) ==="
