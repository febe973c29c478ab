"""Single-query p50 lab at scale (VERDICT r4 task #5).

Per query: wall latency of ``search()``, Stage-1 lane count, and the
route taken (host scatter vs device kernel). Then re-times the
device-routed queries with host routing FORCED (HOST_S1_MAX_LANES=inf)
to locate the host-vs-link break-even lane count at this corpus size.

Usage: python scripts/p50_lab.py [n_docs] [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

bench._setup_cache()
from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.index.vector_model import VectorModel

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_Q = int(sys.argv[2]) if len(sys.argv) > 2 else 64

import jax
jax.devices()
floor = bench.measure_link_floor()
print(f"[p50] link floor {floor:.1f}ms", flush=True)

t0 = time.perf_counter()
titles = bench.make_corpus(N_DOCS)
eng = SearchEngine.create_default()
eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
print(f"[p50] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s", flush=True)

queries = bench.make_queries(titles, N_Q * 2)
model = eng.vector_model

def lanes_of(q):
    prep = model.prepare_stage1(q)
    if prep is None:
        return 0
    df = model.built.df
    term_ids, _idf, fuzzy_groups = prep
    lanes = 0
    ids = np.asarray(term_ids, np.int64)
    if ids.size:
        lanes += int(np.maximum(df[ids], 0).sum())
    for grp in (fuzzy_groups or ()):
        g = np.asarray(grp, np.int64)
        if g.size:
            lanes += int(np.maximum(df[g], 0).sum())
    return lanes

# warm both single-query shape buckets (host + device route)
for q in queries[N_Q:N_Q + 16]:
    eng.search(Query(q, 10))
print("[p50] warm done", flush=True)

cap = VectorModel.HOST_S1_MAX_LANES

def run(tag):
    rows = []
    for q in queries[:N_Q]:
        t = time.perf_counter()
        eng.search(Query(q, 10))
        ms = (time.perf_counter() - t) * 1000.0
        rows.append((lanes_of(q), ms))
    lat = sorted(ms for _, ms in rows)
    print(f"[p50] {tag}: p50={lat[len(lat)//2]:.1f}ms "
          f"p90={lat[int(len(lat)*0.9)]:.1f}ms "
          f"max={lat[-1]:.1f}ms", flush=True)
    return rows

rows = run(f"current (cap={cap})")
host_routed = [(l, ms) for l, ms in rows if l <= cap]
dev_routed = [(l, ms) for l, ms in rows if l > cap]
print(f"[p50] routes: host={len(host_routed)} device={len(dev_routed)}")
if host_routed:
    hs = sorted(ms for _, ms in host_routed)
    print(f"[p50]   host-routed p50={hs[len(hs)//2]:.1f}ms "
          f"lanes p50={sorted(l for l,_ in host_routed)[len(host_routed)//2]}")
if dev_routed:
    ds = sorted(ms for _, ms in dev_routed)
    print(f"[p50]   dev-routed  p50={ds[len(ds)//2]:.1f}ms "
          f"lanes p50={sorted(l for l,_ in dev_routed)[len(dev_routed)//2]} "
          f"max={max(l for l,_ in dev_routed)}")

# force host routing for EVERYTHING and re-time
VectorModel.HOST_S1_MAX_LANES = 1 << 62
try:
    # re-warm the forced route once (first big host scatter allocates)
    for q in queries[N_Q:N_Q + 4]:
        eng.search(Query(q, 10))
    rows_f = run("host-forced (cap=inf)")
    # per-lane-bucket host cost to locate break-even
    buckets = {}
    for l, ms in rows_f:
        b = 1 << max(int(l).bit_length(), 10)
        buckets.setdefault(b, []).append(ms)
    for b in sorted(buckets):
        v = sorted(buckets[b])
        print(f"[p50]   lanes<={b:>9}: n={len(v):>3} p50={v[len(v)//2]:.1f}ms")
finally:
    VectorModel.HOST_S1_MAX_LANES = cap
