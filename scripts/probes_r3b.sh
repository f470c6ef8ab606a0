#!/bin/bash
# Merge-economics probes for canonical_uniform28 (serialized, run
# alongside the r3 campaign — correctness probes only, no timing).
cd /root/repo || exit 1
for v in prior3 sharplik prior3_sharplik; do
  echo "=== probe $v ($(date +%H:%M:%S)) ==="
  timeout 7200 python scripts/probe_u28.py --variant "$v" --iters 60000 \
    > "runs/u28_probe_${v}.log" 2>&1
  echo "rc=$? ($(date +%H:%M:%S))"
  timeout 1200 python scripts/eval_checkpoint.py --config canonical_uniform28 \
    --workdir "runs/u28_probe_${v}" \
    $(python - "$v" <<'EOF'
import sys
v = sys.argv[1]
sets = []
if "prior3" in v:
    pass  # prior overrides affect training only; eval model is unchanged
if "sharplik" in v:
    sets += ["--model-set", "output_std=0.10"]
print(" ".join(sets))
EOF
) --batches 8 > "runs/u28_probe_${v}_eval.log" 2>&1
  echo "eval rc=$? ($(date +%H:%M:%S))"
done
echo "=== probes done ($(date +%H:%M:%S)) ==="
