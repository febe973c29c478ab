"""Config-4 A/B: masked-tier deep walk on/off, ONE process/backend.

The round-5 diagnosis (README): a ~9.3%-selective filter underfills the
10x-top_k tier pool, so ~every tier query falls back to the dense
masked device pass (751ms/batch at 1M). INFIDEX_TPU_MASKED_TIER_DEEP=1
re-selects with top_k scaled by 1/selectivity. This measures both
settings against the same engine + backend (env read per query).

Usage: python scripts/c4_masked_ab.py [n_docs] [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    bench._setup_cache()
    import random

    import jax

    from infidex_tpu import (Document, DocumentFields, Filter, Query,
                             SearchEngine, Weight)

    t0 = time.perf_counter()
    jax.devices()
    log(f"[c4ab] backend up in {time.perf_counter()-t0:.0f}s")

    titles = bench.make_corpus(N_DOCS)
    genres = ["drama", "comedy", "action", "scifi", "horror"]
    rng = random.Random(21)
    engine = SearchEngine.create_default()
    docs = []
    for i, t in enumerate(titles):
        fields = DocumentFields()
        fields.add_field("title", t, weight=Weight.HIGH)
        fields.add_field("genre", rng.choice(genres), indexable=False,
                         filterable=True, facetable=True)
        fields.add_field("year", 1950 + rng.randrange(75), indexable=False,
                         filterable=True)
        docs.append(Document(i, fields))
    t0 = time.perf_counter()
    engine.index_documents(docs)
    log(f"[c4ab] indexed in {time.perf_counter()-t0:.0f}s")
    filt = Filter.parse("genre = 'drama' && year >= 1990")

    def make_query(q):
        query = Query(q, 10)
        query.filter = filt
        query.enable_facets = True
        return query

    queries = bench.make_queries(titles, N_QUERIES)
    for setting in ("0", "1", "0"):
        os.environ["INFIDEX_TPU_MASKED_TIER_DEEP"] = setting
        qps, p50, _, split = bench._measure(engine, queries, Query,
                                            make_query=make_query)
        log(f"[c4ab] deep={setting}: {qps:.1f} QPS p50={p50:.0f}ms "
            f"split={split}")


if __name__ == "__main__":
    main()
