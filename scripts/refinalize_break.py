"""Re-finalize cost breakdown at scale: build N docs, add K, time each
stage of calculate_weights (ROUND5.md §10 measurement, now covering the
append-only fast path). CPU-forced; host costs are backend-independent.

Usage: JAX_PLATFORMS=cpu python scripts/refinalize_break.py [n_docs] [k]
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
k = int(sys.argv[2]) if len(sys.argv) > 2 else 40

import bench  # noqa: E402  (corpus generator)
from infidex_tpu import Document, Query, SearchEngine  # noqa: E402

titles = bench.make_corpus(n_docs)
eng = SearchEngine.create_default()
t0 = time.perf_counter()
eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
print(f"initial build {time.perf_counter()-t0:.1f}s", flush=True)

for round_no in range(3):
    t0 = time.perf_counter()
    for j in range(k):
        eng.index_document(
            Document(10**7 + round_no * k + j, f"streamed doc {j % 50}"))
    t_add = time.perf_counter() - t0

    m = eng._vector_model
    t0 = time.perf_counter()
    m.calculate_weights()
    t_bil = time.perf_counter() - t0
    t0 = time.perf_counter()
    if eng._word_matcher is not None:
        eng._word_matcher.finalize_index()
    t_wm = time.perf_counter() - t0
    t0 = time.perf_counter()
    m.build_optimized_indexes()
    t_boi = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng._rebuild_short_query_resolver()
    t_res = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng._pipeline.invalidate_caches(appended_terms=eng._appended_terms())
    eng._column_store = None
    eng._is_indexed = True
    t_inv = time.perf_counter() - t0
    total = t_bil + t_wm + t_boi + t_res + t_inv
    print(f"round {round_no}: add({k})={t_add*1e3:.0f}ms "
          f"build_inverted={t_bil*1e3:.0f}ms wm={t_wm*1e3:.0f}ms "
          f"build_optimized={t_boi*1e3:.0f}ms resolver={t_res*1e3:.0f}ms "
          f"invalidate={t_inv*1e3:.0f}ms TOTAL={total*1e3:.0f}ms "
          f"(append={m._last_append})", flush=True)

# a short query right after finalize (pays any lazy rebuild)
t0 = time.perf_counter()
eng.search(Query("st", 10))
print(f"first short query after finalize {time.perf_counter()-t0:.2f}s",
      flush=True)
t0 = time.perf_counter()
eng.search(Query("streamed", 10))
print(f"first word query after finalize {time.perf_counter()-t0:.2f}s",
      flush=True)
