"""Single-threaded per-component host cost at scale (CPU backend).

Times, per bench query, the host primitives the batch pipeline runs on
threads (where wall-clock attribution is GIL-muddied): WordMatcher
lookup, conjunctive pool, tiered Stage-1. Then a cProfile over the lot.

Usage: JAX_PLATFORMS=cpu python scripts/host_micro.py [n_docs] [n_queries]
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

import numpy as np

from infidex_tpu import Document, Query, SearchEngine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 128
IDX = f"/tmp/idx_lab_{N}.bin"


def build_or_load():
    if os.path.exists(IDX):
        t0 = time.perf_counter()
        eng = SearchEngine.load(IDX)
        print(f"[micro] loaded {IDX} in {time.perf_counter()-t0:.1f}s",
              flush=True)
    else:
        eng = SearchEngine.create_default()
        titles = bench.make_corpus(N)
        t0 = time.perf_counter()
        eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
        print(f"[micro] indexed in {time.perf_counter()-t0:.1f}s", flush=True)
        eng.save(IDX)
    return eng


def main():
    eng = build_or_load()
    titles = bench.make_corpus(N)   # queries need the corpus vocab
    queries = bench.make_queries(titles, NQ)
    pipe = eng._pipeline
    model = pipe._model
    wm = pipe._word_matcher
    wm.finalize_index()

    # --- per-component timings (single thread) -----------------------
    t_wm = t_conj = t_tier = 0.0
    n_conj = n_tier = 0
    groups_of = {}
    for q in queries:
        t0 = time.perf_counter()
        g = wm.lookup_parts_grouped(q, True)
        t_wm += time.perf_counter() - t0
        groups_of[q] = g

    from infidex_tpu.index.conjunctive import conjunctive_pool

    preps = {}
    for q in queries:
        preps[q] = model.prepare_stage1(q)
    for q in queries:
        g = groups_of[q]
        if len(g) >= 2:
            t0 = time.perf_counter()
            conjunctive_pool(model, g, preps[q])
            t_conj += time.perf_counter() - t0
            n_conj += 1
    for q in queries:
        prep = preps[q]
        if prep is not None and model._tier_gate(prep):
            t0 = time.perf_counter()
            model.stage1_tiered_maybe(prep, 500)
            t_tier += time.perf_counter() - t0
            n_tier += 1

    print(f"[micro] wm lookup: {t_wm*1000:.0f}ms total "
          f"({t_wm/len(queries)*1000:.2f}ms/q, n={len(queries)})")
    print(f"[micro] conj pool: {t_conj*1000:.0f}ms total "
          f"({(t_conj/max(n_conj,1))*1000:.2f}ms/q, n={n_conj})")
    print(f"[micro] tier s1:   {t_tier*1000:.0f}ms total "
          f"({(t_tier/max(n_tier,1))*1000:.2f}ms/q, n={n_tier})")

    # --- cProfile over the whole mix ---------------------------------
    prof = cProfile.Profile()
    prof.enable()
    for q in queries:
        g = wm.lookup_parts_grouped(q, True)
        if len(g) >= 2:
            conjunctive_pool(model, g, preps[q])
        prep = preps[q]
        if prep is not None and model._tier_gate(prep):
            model.stage1_tiered_maybe(prep, 500)
    prof.disable()
    buf = io.StringIO()
    pstats.Stats(prof, stream=buf).sort_stats("cumulative").print_stats(28)
    print(buf.getvalue())


if __name__ == "__main__":
    main()
