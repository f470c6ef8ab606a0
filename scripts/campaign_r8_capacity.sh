#!/bin/bash
# Capacity-channel probes on the 28 px forced-overlap task: waits for
# campaign_r7 (serving sweep) to drain, then runs the two representation-
# limiting variants (slimdec, what20) at 60k steps each + held-out evals.
# Hypothesis documented in scripts/probe_u28.py: the residual 2->1
# merges survive every count-prior dose because a merged window's z_what
# buys the composite for fewer KL nats than a second object costs; a
# decoder/latent too small to render composites moves that cost to the
# likelihood where the merge should lose.
cd /root/repo || exit 1
mkdir -p runs

if [ -f /tmp/campaign_r7.pid ]; then
  while kill -0 "$(cat /tmp/campaign_r7.pid)" 2>/dev/null; do sleep 60; done
fi

eval_sets() {
  case "$1" in
    slimdec) echo "--model-set decoder_hidden=(64,)" ;;
    what20)  echo "--model-set n_what=20" ;;
  esac
}

for v in slimdec what20; do
  echo "=== probe $v ($(date +%H:%M:%S)) ==="
  timeout 7200 python scripts/probe_u28.py --variant "$v" --iters 60000 \
    > "runs/u28_probe_${v}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 1200 python scripts/eval_checkpoint.py \
    --config canonical_uniform28 --workdir "runs/u28_probe_${v}" \
    $(eval_sets "$v") --batches 8 > "runs/u28_probe_${v}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
done
echo "=== campaign r8 done ($(date +%H:%M:%S)) ==="
