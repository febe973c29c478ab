#!/bin/bash
# Round-4 queued measurement session (run AFTER any live bench ends:
# the axon tunnel is single-tenant — a second JAX process hangs it).
# Run: nohup bash scripts/r4_queue.sh & — output in /tmp/r4_queue.log
cd /root/repo
exec > /tmp/r4_queue.log 2>&1
echo "=== r4 queue start $(date +%H:%M:%S) ==="

echo "--- [1] config 1 exact 1M $(date +%H:%M:%S) ---"
timeout 3000 python bench.py exact 1000000 256

echo "--- [2] config 3 multifield 1M $(date +%H:%M:%S) ---"
timeout 3000 python bench.py multifield 1000000 256

echo "--- [3] config 4 filters 1M $(date +%H:%M:%S) ---"
timeout 3000 python bench.py filters 1000000 192

echo "--- [4] config 5 incremental 1M $(date +%H:%M:%S) ---"
timeout 3000 python bench.py incremental 1000000 192

echo "--- [5] mmap-vs-resident A/B 300k $(date +%H:%M:%S) ---"
timeout 2400 python scripts/mmap_ab.py 300000

echo "--- [6] fuzzy 300k (single-query + headline at mid scale) ---"
timeout 2400 python bench.py 300000 256

echo "=== r4 queue done $(date +%H:%M:%S) ==="
