#!/bin/bash
# Anneal-dose probes for canonical_uniform28 (see probe_u28.py prior2/
# priormild rationale).  Waits for the currently-running probe process
# (/tmp/probe.pid) to finish so at most ONE probe shares the chip with
# the r3 campaign.  Correctness probes only — no timing measurements.
cd /root/repo || exit 1

if [ -f /tmp/probe.pid ]; then
  while kill -0 "$(cat /tmp/probe.pid)" 2>/dev/null; do sleep 30; done
fi

for v in prior2 priormild; do
  echo "=== probe $v ($(date +%H:%M:%S)) ==="
  timeout 7200 python scripts/probe_u28.py --variant "$v" --iters 60000 \
    > "runs/u28_probe_${v}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 1200 python scripts/eval_checkpoint.py --config canonical_uniform28 \
    --workdir "runs/u28_probe_${v}" --batches 8 \
    > "runs/u28_probe_${v}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
done
echo "=== probes r3c done ($(date +%H:%M:%S)) ==="
