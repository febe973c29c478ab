#!/bin/bash
# Round-5 tunnel waiter: poll link health; when the tunnel is both UP
# and HEALTHY (latency floor + bandwidth within gate), run the round-5
# measurement queue once. Respects /tmp/cpu_busy (1-core host: CPU-side
# jobs must finish first or both measurements are garbage).
# Run: nohup bash scripts/r5_waiter.sh & — output in /tmp/r5_waiter.log
cd /root/repo
exec > /tmp/r5_waiter.log 2>&1
echo "=== r5 waiter start $(date +%H:%M:%S) ==="
while true; do
  if [ -e /tmp/cpu_busy ]; then
    echo "$(date +%H:%M:%S) cpu busy, sleeping 120s"
    sleep 120
    continue
  fi
  if timeout 180 python scripts/link_health.py; then
    echo "$(date +%H:%M:%S) tunnel HEALTHY — running r5 queue"
    bash scripts/r5_queue.sh
    echo "=== r5 waiter done $(date +%H:%M:%S) ==="
    exit 0
  fi
  echo "$(date +%H:%M:%S) tunnel down/degraded, retrying in 180s"
  sleep 180
done
