"""Fast-iteration host-path lab at 1M: build the engine ONCE, snapshot
it to /tmp/idx1m_lab, and on later runs load the snapshot (~10s) instead
of rebuilding (~90s). Prints warm per-query host cost plus the native
tier-select phase split (infidex_tier_phase_stats).

Usage: JAX_PLATFORMS=cpu python scripts/host_lab.py [n_docs] [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()
from infidex_tpu import Document, SearchEngine, native

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 256
SNAP = f"/tmp/idx1m_lab/{N_DOCS}"

t0 = time.perf_counter()
if os.path.exists(SNAP):
    eng = SearchEngine.load(SNAP)
    print(f"[lab] loaded {N_DOCS} snapshot in {time.perf_counter()-t0:.0f}s",
          flush=True)
else:
    titles = bench.make_corpus(N_DOCS)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    print(f"[lab] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s",
          flush=True)
    os.makedirs(SNAP, exist_ok=True)
    eng.save(SNAP)
    print("[lab] snapshot saved", flush=True)

titles = bench.make_corpus(N_DOCS)
queries = bench.make_queries(titles, N_QUERIES)
model = eng._vector_model
pipeline = eng._pipeline
texts = list(queries)


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


one_pass()  # warm
if native.available:
    native.tier_phase_stats(reset=True)
best = None
for rep in range(3):
    t0 = time.perf_counter()
    stats = one_pass()
    wall = time.perf_counter() - t0
    best = min(best or wall, wall)
    print(f"[lab] pass {rep+1}: {wall/N_QUERIES*1000:.2f}ms/q "
          f"tier={stats['tier']} dev={stats['dev']}", flush=True)
print(f"[lab] best {best/N_QUERIES*1000:.2f}ms/q", flush=True)
if native.available:
    ph = native.tier_phase_stats()
    n = max(ph["calls"], 1)
    print("[lab] tier phases ms/call: "
          + " ".join(f"{k}={v*1000/n:.3f}" for k, v in ph.items()
                     if k != "calls") + f" calls={ph['calls']}", flush=True)
