"""Round-4b host lab: per-function cProfile of the full per-query host
path over the CACHED 1M lab index (fast iteration: no reindex).

Usage: JAX_PLATFORMS=cpu python scripts/host_r4b_lab.py [n_docs] [n_queries]
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

import numpy as np  # noqa: E402

from infidex_tpu import Document, SearchEngine  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 256
IDX = f"/tmp/idx_lab_{N}.bin"

t0 = time.perf_counter()
if os.path.exists(IDX):
    eng = SearchEngine.load(IDX)
    print(f"[lab] loaded in {time.perf_counter()-t0:.0f}s", flush=True)
else:
    titles = bench.make_corpus(N)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    eng.save(IDX)
    print(f"[lab] indexed in {time.perf_counter()-t0:.0f}s", flush=True)

titles = bench.make_corpus(N)
queries = bench.make_queries(titles, NQ)
model = eng._vector_model
pipeline = eng._pipeline

texts = [eng._normalize_query(q) if hasattr(eng, "_normalize_query") else q
         for q in queries]


def one_pass():
    from infidex_tpu.index.conjunctive import conjunctive_pool

    stats = {"tier": 0, "dev": 0}
    for q in texts:
        prep = model.prepare_stage1(q)
        if prep is None:
            continue
        groups = pipeline._wm_lookup_parts(q, True)
        if len(groups) >= 2 and model.built is not None:
            conjunctive_pool(model, groups, prep)
        if model._tier_gate(prep):
            stats["tier"] += 1
            model.stage1_tiered_maybe(prep, 500)
        else:
            stats["dev"] += 1
    return stats


one_pass()  # warm memos
pr = cProfile.Profile()
pr.enable()
t0 = time.perf_counter()
stats = one_pass()
wall = time.perf_counter() - t0
pr.disable()
print(f"[lab] {NQ} queries host-side in {wall:.2f}s "
      f"({wall/NQ*1000:.2f}ms/q) tier={stats['tier']} dev={stats['dev']}",
      flush=True)
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(30)
print(s.getvalue())
