"""mmap-mode (flush(materialize=False)) vs resident serving throughput.

VERDICT r3 next-step #10's done-bar: mmap-mode QPS within 2x of
resident at 300k. Both engines serve the same corpus; mmap flushes 90%
of it to a disk segment and streams per-batch mini CSRs through the
device kernel (index/mmap_serving.py device path).

Usage: python scripts/mmap_ab.py [n_docs] [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()
from infidex_tpu import Document, Query, SearchEngine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 192
FLUSH_AT = int(N * 0.9)
titles = bench.make_corpus(N)
queries = bench.make_queries(titles, NQ)


def run(mmap: bool) -> float:
    eng = SearchEngine.create_default()
    t0 = time.perf_counter()
    if mmap:
        eng.index_documents([Document(i, t)
                             for i, t in enumerate(titles[:FLUSH_AT])])
        eng.flush(f"/tmp/mmap_ab_{N}.ifts", materialize=False)
        eng.index_documents([Document(FLUSH_AT + i, t)
                             for i, t in enumerate(titles[FLUSH_AT:])])
    else:
        eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    print(f"[{'mmap' if mmap else 'resident'}] indexed {N} in "
          f"{time.perf_counter() - t0:.0f}s resident_postings="
          f"{int(eng.vector_model.built.postings_docs.size)}", flush=True)
    qs = [Query(q, 10) for q in queries]
    eng.search_many(qs, batch_size=64)   # warm every shape bucket
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        eng.search_many(qs, batch_size=64)
        best = max(best, len(qs) / (time.perf_counter() - t0))
    print(f"[{'mmap' if mmap else 'resident'}] {best:.1f} QPS", flush=True)
    return best


resident = run(False)
mm = run(True)
print(f"[A/B] resident {resident:.1f} QPS vs mmap {mm:.1f} QPS "
      f"-> ratio {resident / max(mm, 1e-9):.2f}x (bar: <= 2x)")
