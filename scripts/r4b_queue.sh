#!/bin/bash
# Round-4 second measurement session (post host-kernel cuts).
# Single-tenant tunnel: run only when no other JAX/TPU process is live.
# Run: nohup bash scripts/r4b_queue.sh & — output in /tmp/r4b_queue.log
cd /root/repo
exec > /tmp/r4b_queue.log 2>&1
export INFIDEX_TPU_REQUIRE_TPU=1
echo "=== r4b queue start $(date +%H:%M:%S) ==="

echo "--- [1] headline 1M (new host kernels) $(date +%H:%M:%S) ---"
timeout 3000 python bench.py 1000000 256

echo "--- [2] 1M lane-budget A/B 131072 $(date +%H:%M:%S) ---"
INFIDEX_TPU_TIER_LANES=131072 timeout 2400 python bench.py 1000000 192

echo "--- [3] config 1 exact 1M $(date +%H:%M:%S) ---"
timeout 2400 python bench.py exact 1000000 192

echo "--- [4] config 3 multifield 1M $(date +%H:%M:%S) ---"
timeout 2400 python bench.py multifield 1000000 192

echo "--- [5] config 4 filters 1M $(date +%H:%M:%S) ---"
timeout 2400 python bench.py filters 1000000 192

echo "--- [6] config 5 incremental 1M $(date +%H:%M:%S) ---"
timeout 2400 python bench.py incremental 1000000 192

echo "--- [7] 300k headline $(date +%H:%M:%S) ---"
timeout 1800 python bench.py 300000 256

echo "=== r4b queue done $(date +%H:%M:%S) ==="
