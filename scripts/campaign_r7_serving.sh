#!/bin/bash
# Serving-occupancy probe: waits for campaign_r6 (bench refresh), then
# re-runs the serving sweep with the extended 16k/32k batch rows to test
# whether the occupancy-bound serving path scales past batch 8192.
cd /root/repo || exit 1
mkdir -p runs

if [ -f /tmp/campaign_r6.pid ]; then
  while kill -0 "$(cat /tmp/campaign_r6.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== serving sweep 256..32768 ($(date +%H:%M:%S)) ==="
timeout 7200 python -m benchmarks.harness serving \
  > runs/serving_r4.log 2>&1
echo "rc=$? ($(date +%H:%M:%S))"
tail -30 runs/serving_r4.log
echo "=== campaign r7 done ($(date +%H:%M:%S)) ==="
