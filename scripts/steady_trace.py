"""Steady-state per-stage trace: warm memos first, then trace batches.

The 3-batch trace runs cold (conj bitset builds, jit buckets, memo
fills land in the measured batch), which misattributes steady-state
host cost. This warms TWO full stream passes, then traces one more
pass and prints the [PIPE] marks of its LAST batch plus the serving
split — the numbers that match the bench's median pass.

Usage: python scripts/steady_trace.py [n_docs] [n_queries] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()
from infidex_tpu import Document, Query, SearchEngine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 192
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 64

titles = bench.make_corpus(N)
eng = SearchEngine.create_default()
t0 = time.perf_counter()
eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
print(f"[steady] indexed {N} in {time.perf_counter() - t0:.0f}s", flush=True)
queries = bench.make_queries(titles, NQ)
qs = [Query(q, 10) for q in queries]

for p in range(2):   # warm: compiles, memos, bitsets
    t0 = time.perf_counter()
    eng.search_many(qs, batch_size=BATCH)
    print(f"[steady] warm pass {p + 1}: "
          f"{len(qs) / (time.perf_counter() - t0):.1f} QPS", flush=True)

os.environ["INFIDEX_TPU_TRACE"] = "1"
eng.serving_split()
t0 = time.perf_counter()
eng.search_many(qs, batch_size=BATCH)
wall = time.perf_counter() - t0
split = eng.serving_split()
n_batches = (len(qs) + BATCH - 1) // BATCH
print(f"[steady] traced pass: {len(qs) / wall:.1f} QPS "
      f"batch={wall / n_batches * 1000:.0f}ms "
      f"device={split['device_wait_s'] * 1000 / n_batches:.0f}ms "
      f"calls/batch={split['device_calls'] / n_batches:.1f}", flush=True)
