#!/bin/bash
# Queued measurement session for when the TPU tunnel is back.
# Run: nohup bash scripts/tpu_session.sh & — output in /tmp/tpu_session.log
cd /root/repo
exec > /tmp/tpu_session.log 2>&1
echo "=== TPU session start $(date +%H:%M:%S) ==="

echo "--- [1] overlap probe 300k (threads vs single-thread pipeline) ---"
timeout 1800 python scripts/overlap_probe.py 300000

echo "--- [2] bench 300k (primes driver cache) $(date +%H:%M:%S) ---"
timeout 2400 python bench.py

echo "--- [3] bench 10k $(date +%H:%M:%S) ---"
timeout 1200 python bench.py 10000 256

echo "--- [4] bench 1M batch=64 $(date +%H:%M:%S) ---"
timeout 3000 python bench.py 1000000 256

echo "--- [5] bench 1M batch=128 $(date +%H:%M:%S) ---"
timeout 3000 python bench.py 1000000 256 128

echo "--- [6] per-stage trace 1M (pipelined marks incl tier_cpu) $(date +%H:%M:%S) ---"
timeout 3000 python scripts/host_stage_lab.py 1000000 4

echo "--- [7] Stage-1 phase split A/B at 1M $(date +%H:%M:%S) ---"
echo "[7a] plain top_k (no stable-tie pass)"
INFIDEX_TPU_S1_PLAIN_TOPK=1 timeout 3000 python scripts/host_stage_lab.py 1000000 3
echo "[7b] no LIM block (also DCEs cnt scatter)"
INFIDEX_TPU_S1_NO_LIM=1 timeout 3000 python scripts/host_stage_lab.py 1000000 3
echo "[7c] both off (scatter + one top_k only)"
INFIDEX_TPU_S1_PLAIN_TOPK=1 INFIDEX_TPU_S1_NO_LIM=1 \
  timeout 3000 python scripts/host_stage_lab.py 1000000 3

echo "--- [8] filters config-4 at 1M $(date +%H:%M:%S) ---"
timeout 3000 python bench.py filters 1000000 192

echo "=== done $(date +%H:%M:%S) ==="
