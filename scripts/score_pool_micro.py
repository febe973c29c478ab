"""Microbench score_pool / select / conjunctive_pool on the saved 1M lab
index: per-call timing by pool size and term count, to target the next
host-hot-path cut.

Usage: JAX_PLATFORMS=cpu python scripts/score_pool_micro.py [n_docs] [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()

import numpy as np

from infidex_tpu import Document, SearchEngine
from infidex_tpu.index.candidates import TieredStage1, score_pool
from infidex_tpu.index.conjunctive import conjunctive_pool

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 256
IDX = f"/tmp/idx_lab_{N}.bin"

t0 = time.perf_counter()
if os.path.exists(IDX):
    eng = SearchEngine.load(IDX)
    print(f"[micro] loaded in {time.perf_counter()-t0:.0f}s", flush=True)
else:
    titles = bench.make_corpus(N)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    eng.save(IDX)
    print(f"[micro] indexed in {time.perf_counter()-t0:.0f}s", flush=True)

titles = bench.make_corpus(N)
queries = bench.make_queries(titles, NQ)
model = eng._vector_model
pipeline = eng._pipeline
built = model.built

# ---- gather per-query select/score/conj stats -------------------------
sel_t = sc_t = conj_t = 0.0
sel_calls = []
sc_calls = []  # (n_pool, n_terms, sum_df, ms)
conj_calls = []
tier = TieredStage1(built, None)

for q in queries:
    qn = eng._normalize_query(q) if hasattr(eng, "_normalize_query") else q
    prep = model.prepare_stage1(qn)
    if prep is None:
        continue
    term_ids = [int(t) for t in np.asarray(prep[0]).tolist()]
    idfs = [float(i) for i in np.asarray(prep[1]).tolist()]
    t0 = time.perf_counter()
    pool, tlabel = tier._selector.select(term_ids, idfs, 500, want_union=False)
    dt = time.perf_counter() - t0
    sel_t += dt
    sel_calls.append((pool.size, tlabel, dt * 1e3))
    if tlabel != "union" and pool.size:
        t0 = time.perf_counter()
        score_pool(built, term_ids, idfs, pool)
        dt = time.perf_counter() - t0
        sc_t += dt
        sum_df = sum(int(built.df[t]) for t in term_ids if t >= 0)
        sc_calls.append((pool.size, len(term_ids), sum_df, dt * 1e3))
    groups = pipeline._wm_lookup_parts(qn, True)
    if len(groups) >= 2:
        t0 = time.perf_counter()
        p = conjunctive_pool(model, groups, prep)
        dt = time.perf_counter() - t0
        conj_t += dt
        conj_calls.append((p.size, dt * 1e3))

nq = len(queries)
print(f"[micro] select {sel_t/nq*1e3:.2f}ms/q  score {sc_t/nq*1e3:.2f}ms/q  "
      f"conj {conj_t/nq*1e3:.2f}ms/q  (over all {nq} queries)")

sc = np.array([(a, b, c, d) for a, b, c, d in sc_calls])
if sc.size:
    print(f"[score] {len(sc_calls)} calls: pool p50={np.median(sc[:,0]):.0f} "
          f"p90={np.percentile(sc[:,0],90):.0f} max={sc[:,0].max():.0f}; "
          f"terms p50={np.median(sc[:,1]):.0f}; "
          f"sum_df p50={np.median(sc[:,2]):.0f} max={sc[:,2].max():.0f}; "
          f"ms p50={np.median(sc[:,3]):.3f} p90={np.percentile(sc[:,3],90):.3f} "
          f"max={sc[:,3].max():.2f}")
    # slowest five calls
    idx = np.argsort(-sc[:, 3])[:5]
    for i in idx:
        print(f"[score-slow] pool={sc[i,0]:.0f} terms={sc[i,1]:.0f} "
              f"sum_df={sc[i,2]:.0f} ms={sc[i,3]:.3f}")
cj = np.array(conj_calls)
if cj.size:
    print(f"[conj] {len(conj_calls)} calls: out p50={np.median(cj[:,0]):.0f}; "
          f"ms p50={np.median(cj[:,1]):.3f} p90={np.percentile(cj[:,1],90):.3f} "
          f"max={cj[:,1].max():.2f}")
se = {}
for size, lab, ms in sel_calls:
    se.setdefault(lab, []).append(ms)
for lab, mss in se.items():
    a = np.array(mss)
    print(f"[select:{lab}] n={a.size} ms p50={np.median(a):.3f} "
          f"p90={np.percentile(a,90):.3f} max={a.max():.2f}")
