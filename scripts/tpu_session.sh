#!/bin/bash
# Queued measurement session for when the TPU tunnel is back.
# Run: nohup bash scripts/tpu_session.sh & — output in /tmp/tpu_session.log
cd /root/repo
exec > /tmp/tpu_session.log 2>&1
echo "=== TPU session start $(date +%H:%M:%S) ==="
echo "--- overlap probe 300k (threads vs single-thread pipeline) ---"
timeout 1800 python scripts/overlap_probe.py 300000
echo "--- bench 300k (primes driver cache) $(date +%H:%M:%S) ---"
timeout 2400 python bench.py
echo "--- bench 10k $(date +%H:%M:%S) ---"
timeout 1200 python bench.py 10000 256
echo "--- bench 1M batch=64 $(date +%H:%M:%S) ---"
timeout 3000 python bench.py 1000000 256
echo "--- bench 1M batch=128 $(date +%H:%M:%S) ---"
timeout 3000 python bench.py 1000000 256 128
echo "--- traced 1M run (per-stage timings, pipelined) $(date +%H:%M:%S) ---"
INFIDEX_TPU_TRACE=1 timeout 3000 python bench.py 1000000 128
echo "=== done $(date +%H:%M:%S) ==="
