"""Batch-vs-single parity check at scale: search_batch([q]) must equal
search(q) for every query, and batch composition must not change results.

Usage: python scripts/batch_single_check.py [n_docs] [per_mode]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
bench._setup_cache()   # persistent XLA compile cache (TPU runs)
from infidex_tpu import Document, Query, SearchEngine


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    per_mode = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t0 = time.perf_counter()
    titles = bench.make_corpus(n_docs)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    print(f"[check] indexed {n_docs} in {time.perf_counter()-t0:.0f}s",
          flush=True)

    import scripts.recall_study as rs
    modes = rs.make_mode_queries(titles, per_mode)
    bad = 0
    for mode, queries in modes.items():
        batch = eng.search_batch([Query(q, 10) for q in queries])
        for q, br in zip(queries, batch):
            sr = eng.search(Query(q, 10))
            a = [(r.document_id, round(r.score, 3)) for r in sr.records]
            b = [(r.document_id, round(r.score, 3)) for r in br.records]
            if a != b:
                bad += 1
                print(f"[DIVERGE {mode}] {q!r}\n  single={a[:5]}\n"
                      f"  batch ={b[:5]}", flush=True)
    print(f"[check] divergences: {bad}", flush=True)


if __name__ == "__main__":
    main()
