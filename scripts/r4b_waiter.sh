#!/bin/bash
# Wait for the axon tunnel, then run the r4b measurement queue.
# Run: nohup bash scripts/r4b_waiter.sh & — output in /tmp/r4b_waiter.log
cd /root/repo
exec > /tmp/r4b_waiter.log 2>&1
echo "=== r4b waiter start $(date +%H:%M:%S) ==="
while true; do
  if timeout 150 python -c \
      "import numpy, jax, jax.numpy as jnp; numpy.asarray(jnp.ones(4)+1)" \
      > /dev/null 2>&1; then
    while [ -e /tmp/cpu_busy ]; do
      echo "tunnel up but /tmp/cpu_busy present, waiting 60s"
      sleep 60
    done
    echo "tunnel up at $(date +%H:%M:%S) — starting r4b queue"
    bash scripts/r4b_queue.sh
    echo "=== r4b waiter done $(date +%H:%M:%S) ==="
    exit 0
  fi
  echo "tunnel down at $(date +%H:%M:%S), retrying in 90s"
  sleep 90
done
