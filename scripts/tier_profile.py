"""Profile the host tiered Stage-1 (select vs score_pool) at bench scale.

Builds the bench corpus index once, replays the bench's tiered queries
through TieredStage1.run, and reports per-phase time: tier selection
(intersections/champions/unique) vs pool BM25 scoring. Drives the
tier_cpu optimization work — the steady-state host cost per 64-batch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from bench import make_corpus, make_queries

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000

from infidex_tpu import Document, Query, SearchEngine

t0 = time.perf_counter()
engine = SearchEngine.create_default()
engine.index_documents([Document(i, t) for i, t in enumerate(make_corpus(N))])
print(f"indexed {N} in {time.perf_counter()-t0:.1f}s", flush=True)

queries = make_queries(make_corpus(N), 256)
model = engine._vector_model
pipeline = engine._pipeline

# Collect the preps that route to the tier path, as the pipeline would.
preps = []
for q in queries:
    prep = model.prepare_stage1(q)
    if prep is not None and model._tier_gate(prep):
        preps.append((q, prep))
print(f"{len(preps)}/{len(queries)} queries route to the tier path")

from infidex_tpu.index.candidates import TieredStage1, score_pool

ts = TieredStage1(model.built, model.deleted_arr)
sel_t = sc_t = 0.0
pool_sizes = []
import cProfile, pstats

pr = cProfile.Profile()
pr.enable()
for q, prep in preps:
    term_ids, idfs, fuzzy = prep
    t0 = time.perf_counter()
    pool, tier = ts._selector.select([int(t) for t in term_ids],
                                     [float(i) for i in idfs], 500,
                                     want_union=False)
    sel_t += time.perf_counter() - t0
    if tier == "union" or pool.size == 0:
        continue
    pool_sizes.append(pool.size)
    t0 = time.perf_counter()
    score_pool(model.built, term_ids, idfs, pool)
    sc_t += time.perf_counter() - t0
pr.disable()
n = max(1, len(preps))
print(f"select: {sel_t*1000:.1f}ms total, {sel_t/n*1000:.2f}ms/q")
print(f"score_pool: {sc_t*1000:.1f}ms total, {sc_t/n*1000:.2f}ms/q")
if pool_sizes:
    print(f"pool sizes: mean={np.mean(pool_sizes):.0f} "
          f"p90={np.percentile(pool_sizes, 90):.0f} max={max(pool_sizes)}")
stats = pstats.Stats(pr)
stats.sort_stats("cumulative").print_stats(18)
