#!/bin/bash
# Wait for the axon tunnel to come back, then run the round-4
# measurement program (1M fuzzy bench + r4_queue). Single-tenant chip:
# nothing else may touch the axon backend while this runs.
# Run: nohup bash scripts/tpu_waiter.sh & — output in /tmp/tpu_waiter.log
cd /root/repo
exec > /tmp/tpu_waiter.log 2>&1
echo "=== tpu waiter start $(date +%H:%M:%S) ==="
while true; do
  if timeout 120 python -c \
      "import numpy, jax, jax.numpy as jnp; numpy.asarray(jnp.ones(4)+1)" \
      > /dev/null 2>&1; then
    # 1-core host: wait out any CPU-heavy side job before benching
    while [ -e /tmp/cpu_busy ]; do
      echo "tunnel up but /tmp/cpu_busy present, waiting 60s"
      sleep 60
    done
    echo "tunnel up at $(date +%H:%M:%S) — running 1M fuzzy bench"
    timeout 3000 python bench.py 2>&1 | grep -a -v cpu_aot_loader
    echo "--- fuzzy 1M done $(date +%H:%M:%S); starting r4 queue ---"
    bash scripts/r4_queue.sh
    echo "=== tpu waiter done $(date +%H:%M:%S) ==="
    exit 0
  fi
  echo "tunnel down at $(date +%H:%M:%S), retrying in 120s"
  sleep 120
done
