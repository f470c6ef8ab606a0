#!/bin/bash
# Post-resume bench check: waits for campaign_r5 (the u28v2 resume) to
# drain, then (a) verifies the bench explicit-point flag routing on the
# chip (--dtype alone must select the single-point path), and (b)
# refreshes the headline bench JSON.  Timing runs only start once the
# chip is otherwise idle.
cd /root/repo || exit 1
mkdir -p runs

if [ -f /tmp/campaign_r5.pid ]; then
  while kill -0 "$(cat /tmp/campaign_r5.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== bench explicit-point check ($(date +%H:%M:%S)) ==="
timeout 3600 python bench.py --dtype bfloat16 --scan-steps 16 \
  > runs/bench_point_check.json 2> runs/bench_point_check.log
echo "rc=$?"
cat runs/bench_point_check.json

echo "=== headline bench refresh ($(date +%H:%M:%S)) ==="
timeout 3600 python bench.py > runs/bench_headline_r4.json \
  2> runs/bench_headline_r4.log
echo "rc=$?"
cat runs/bench_headline_r4.json
echo "=== campaign r6 done ($(date +%H:%M:%S)) ==="
