#!/bin/bash
# Round-5 TPU measurement queue — run with a HEALTHY tunnel only
# (gate: scripts/link_health.py exit 0). Single-tenant chip + 1-core
# host: nothing else may run concurrently or every number is garbage.
# Run: nohup bash scripts/r5_queue.sh & — output in /tmp/r5_queue.log
cd /root/repo
exec > /tmp/r5_queue.log 2>&1
set -x
date
# 1. Headline: fuzzy 1M (what the driver captures as BENCH_r05) —
#    full ladder: QPS, recall (clipped+unclipped), p50 single, hbm_gbps
timeout 4000 python bench.py 2>&1 | grep -a -v cpu_aot_loader
date
# 2. Batch-width + pipeline-depth A/B at 1M (VERDICT r4 task #8) —
#    QPS-only mode (recall/latency ladders don't change with width)
INFIDEX_TPU_BENCH_QPS_ONLY=1 timeout 2400 python bench.py fuzzy 1000000 768 128 2>&1 \
  | grep -a -v cpu_aot_loader
date
INFIDEX_TPU_BENCH_QPS_ONLY=1 INFIDEX_TPU_PIPELINE_DEPTH=3 \
  timeout 2400 python bench.py fuzzy 1000000 512 2>&1 | grep -a -v cpu_aot_loader
date
# 3. BASELINE configs at 1M (VERDICT r4 task #4)
for mode in exact multifield filters incremental; do
  timeout 3000 python bench.py "$mode" 1000000 512 2>&1 | grep -a -v cpu_aot_loader
  date
done
# 4. mmap serving A/B at 300k (VERDICT r4 task #6a)
timeout 2400 python scripts/mmap_ab.py 300000 256 2>&1 | grep -a -v cpu_aot_loader
date
# (Per-mode unclipped recall at 1M ran on the CPU backend — recall is
# backend-independent; results in ROUND5.md. exact 0.991 / typo 0.961 /
# multi 0.877 / prefix 0.964, n=64/mode, 2026-08-20.)
echo "=== r5 queue done ==="
