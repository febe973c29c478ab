"""Dump the raw [PIPE] trace for a few batches at scale (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["INFIDEX_TPU_TRACE"] = "1"

import bench

bench._setup_cache()
from infidex_tpu import Document, Query, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 3
PIPELINED = os.environ.get("RAW_TRACE_PIPELINED") == "1"
BATCH = 64

t0 = time.perf_counter()
titles = bench.make_corpus(N_DOCS)
eng = SearchEngine.create_default()
eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
print(f"[raw] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s", flush=True)

queries = bench.make_queries(titles, BATCH * (N_BATCHES + 1))
chunks = [queries[i:i + BATCH] for i in range(0, len(queries), BATCH)]
eng.search_batch([Query(q, 10) for q in chunks[0]])   # warm
print("[raw] warm done", flush=True)

if PIPELINED:
    qs = [Query(q, 10) for c in chunks[1:] for q in c]
    t0 = time.perf_counter()
    eng.search_many(qs, batch_size=BATCH)
    wall = time.perf_counter() - t0
    print(f"[raw] pipelined {len(qs)} queries in {wall:.2f}s "
          f"({len(qs)/wall:.1f} QPS)", flush=True)
else:
    for bi, c in enumerate(chunks[1:], 1):
        t0 = time.perf_counter()
        eng.search_batch([Query(q, 10) for q in c])
        print(f"[raw] === batch {bi}: {(time.perf_counter()-t0)*1000:.0f}ms",
              flush=True)
