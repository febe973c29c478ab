"""Do concurrent search_batch calls overlap host work with device waits?

Indexes n_docs, warms every shape bucket, then times the SAME 16-batch
workload three ways: 1 worker (serial), 2 workers, 4 workers. If device
waits release the GIL and readers truly run concurrently, multi-worker
wall should approach max(host_time, device_time) instead of their sum.

Usage: python scripts/overlap_probe.py [n_docs]
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()   # persistent XLA compile cache (TPU runs)
from infidex_tpu import Document, Query, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
BATCH = 64
N_BATCHES = 16


def main():
    t0 = time.perf_counter()
    titles = bench.make_corpus(N_DOCS)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    print(f"[probe] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s",
          flush=True)

    queries = bench.make_queries(titles, BATCH * N_BATCHES)
    chunks = [queries[i:i + BATCH] for i in range(0, len(queries), BATCH)]
    for c in chunks:          # warm every bucket
        eng.search_batch([Query(q, 10) for q in c])
    print("[probe] warm", flush=True)

    for workers in (1, 2, 4, 2, 1):
        t0 = time.perf_counter()
        if workers == 1:
            for c in chunks:
                eng.search_batch([Query(q, 10) for q in c])
        else:
            with ThreadPoolExecutor(max_workers=workers) as pool:
                list(pool.map(
                    lambda c: eng.search_batch([Query(q, 10) for q in c]),
                    chunks))
        wall = time.perf_counter() - t0
        print(f"[probe] workers={workers}: wall={wall:.2f}s "
              f"qps={len(queries)/wall:.1f}", flush=True)

    # Single-thread software pipeline (async dispatch — the approach that
    # does NOT depend on the GIL being released during device waits).
    for depth in (2, 3, 2):
        t0 = time.perf_counter()
        eng.search_many([Query(q, 10) for q in queries], batch_size=BATCH,
                        pipeline_depth=depth)
        wall = time.perf_counter() - t0
        print(f"[probe] pipelined depth={depth}: wall={wall:.2f}s "
              f"qps={len(queries)/wall:.1f}", flush=True)


if __name__ == "__main__":
    main()
