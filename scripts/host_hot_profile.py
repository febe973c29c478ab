"""cProfile the per-query HOST hot path at scale, single-threaded.

Profiles exactly the work the batch pipeline runs on the host per query
(prepare_stage1, tier gate+tiered Stage-1, WordMatcher lookups, the
conjunctive pool) WITHOUT device calls, so the numbers are pure host
CPU — the side that binds serving at 1M (BENCH r4: host 453ms vs
device 123ms per 64-batch).

Usage: JAX_PLATFORMS=cpu python scripts/host_hot_profile.py [n_docs] [n_queries]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()
from infidex_tpu import Document, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 256

t0 = time.perf_counter()
titles = bench.make_corpus(N_DOCS)
eng = SearchEngine.create_default()
eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
print(f"[prof] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s", flush=True)

queries = bench.make_queries(titles, N_QUERIES)
model = eng._vector_model
pipeline = eng._pipeline
wm = eng._word_matcher

# Normalize like the engine does before profiling (cheap, not the target).
texts = [eng._normalize_query(q) if hasattr(eng, "_normalize_query") else q
         for q in queries]


def one_pass():
    """Mirror the SERVING host path: per-query prepare + WM lookup +
    conjunctive pool, then the whole tier group through ONE native
    infidex_tier_batch call per 64-batch (scoring/pipeline.py:596-611),
    not the legacy per-query run()."""
    from infidex_tpu.index.conjunctive import conjunctive_pool

    stats = {"tier": 0, "dev": 0}
    tiered = model._tiered_for()
    for lo in range(0, len(texts), 64):
        tier_preps = []
        for q in texts[lo : lo + 64]:
            prep = model.prepare_stage1(q)
            if prep is None:
                continue
            # WordMatcher lookup (what the wm prefetch job runs)
            groups = pipeline._wm_lookup_parts(q, True)
            # Conjunctive pool (what the conj prefetch job runs)
            if len(groups) >= 2 and model.built is not None:
                conjunctive_pool(model, groups, prep)
            if model._tier_gate(prep):
                stats["tier"] += 1
                tier_preps.append(prep)
            else:
                stats["dev"] += 1
        if tier_preps and tiered is not None:
            tiered.run_batch(tier_preps, 500)
    return stats


one_pass()  # warm caches (memoized champion tables etc.)
pr = cProfile.Profile()
pr.enable()
t0 = time.perf_counter()
stats = one_pass()
wall = time.perf_counter() - t0
pr.disable()
print(f"[prof] {N_QUERIES} queries host-side in {wall:.2f}s "
      f"({wall/N_QUERIES*1000:.2f}ms/q) tier={stats['tier']} dev={stats['dev']}",
      flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28)
print(s.getvalue())
