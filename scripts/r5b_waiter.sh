#!/bin/bash
# Round-5 tunnel waiter (take 2): when the link is UP and HEALTHY,
# run the single-query p50 lab first (informs the interactive routing
# decision), then the full round-5 measurement queue.
# Run: nohup bash scripts/r5b_waiter.sh & — output in /tmp/r5b_waiter.log
cd /root/repo
exec > /tmp/r5b_waiter.log 2>&1
echo "=== r5b waiter start $(date +%H:%M:%S) ==="
while true; do
  if [ -e /tmp/cpu_busy ]; then
    echo "$(date +%H:%M:%S) cpu busy, sleeping 120s"
    sleep 120
    continue
  fi
  timeout 180 python scripts/link_health.py
  rc=$?
  if [ $rc -ne 0 ] && [ $rc -ne 124 ]; then
    # UP but degraded (probe returned, gate failed): a degraded capture
    # beats none — proceed anyway after 45 min of continuous degradation.
    if [ -z "$DEGRADED_SINCE" ]; then DEGRADED_SINCE=$(date +%s); fi
    if [ $(( $(date +%s) - DEGRADED_SINCE )) -gt 2700 ]; then
      echo "$(date +%H:%M:%S) degraded >45min — proceeding anyway"
      rc=0
    fi
  elif [ $rc -eq 124 ]; then
    DEGRADED_SINCE=""
  fi
  if [ $rc -eq 0 ]; then
    echo "$(date +%H:%M:%S) tunnel usable — p50 lab first"
    timeout 1800 python scripts/p50_lab.py 1000000 48 > /tmp/p50_lab.log 2>&1
    echo "$(date +%H:%M:%S) p50 lab done — running r5 queue"
    bash scripts/r5_queue.sh
    echo "=== r5b waiter done $(date +%H:%M:%S) ==="
    exit 0
  fi
  echo "$(date +%H:%M:%S) tunnel down/degraded, retrying in 180s"
  sleep 180
done
