"""Phase breakdown of conjunctive_pool's native call at 1M.

Times the full native call vs a ranking-free call (score_tids=[]) on the
same inputs — the difference isolates strong-count + class-select +
BM25; the base isolates pivot filtering + merge. Also sweeps ANCHOR_CLIP.

Usage: JAX_PLATFORMS=cpu python scripts/conj_phase_lab.py [n_docs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()

import numpy as np

from infidex_tpu import Document, SearchEngine
from infidex_tpu import native
from infidex_tpu.index import conjunctive as conj

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
IDX = f"/tmp/idx_lab_{N}.bin"

t0 = time.perf_counter()
if os.path.exists(IDX):
    eng = SearchEngine.load(IDX)
else:
    titles = bench.make_corpus(N)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    eng.save(IDX)
print(f"[lab] index ready in {time.perf_counter()-t0:.0f}s", flush=True)

titles = bench.make_corpus(N)
queries = bench.make_queries(titles, 256)
model = eng._vector_model
pipeline = eng._pipeline
built = model.built

# Gather the native-call inputs for every multi-word query (warm memos).
cases = []
for q in queries:
    qn = eng._normalize_query(q) if hasattr(eng, "_normalize_query") else q
    prep = model.prepare_stage1(qn)
    groups = pipeline._wm_lookup_parts(qn, True)
    if len(groups) >= 2 and prep is not None:
        conj.conjunctive_pool(model, groups, prep)  # warm evidence memo
        cases.append((qn, groups, prep))
print(f"[lab] {len(cases)} multi-word cases; memo warm", flush=True)

memo = model._conj_token_evidence[1]


def run_one(groups, prep, with_rank=True):
    infos = [memo[w] for w, _ in groups]
    if prep is not None and with_rank:
        score_tids = [int(t) for t in np.asarray(prep[0]).tolist()]
        score_idfs = [float(i) for i in np.asarray(prep[1]).tolist()]
    else:
        score_tids, score_idfs = [], []
    tables = getattr(model, "coverage_tables", None)
    tok_count = (tables.tok_count_host if tables is not None
                 and tables.tok_count_host is not None else None)
    return native.conj_pool_native(
        built, [inf.anchor_union for inf in infos],
        np.stack([inf.ev_bits for inf in infos]),
        np.stack([inf.an_bits for inf in infos]),
        np.array([1 if (inf.gram_tids or inf.anchors) else 0
                  for inf in infos], np.uint8),
        score_tids, score_idfs, tok_count,
        conj.ANCHOR_CLIP, conj.CONJ_CAP)


for label, with_rank in (("full", True), ("no-rank", False)):
    t0 = time.perf_counter()
    for qn, groups, prep in cases:
        run_one(groups, prep, with_rank)
    dt = (time.perf_counter() - t0) / len(cases) * 1e3
    print(f"[lab] {label}: {dt:.3f}ms/call", flush=True)

# anchor-union / pool-size stats for the cases
au = []
for qn, groups, prep in cases:
    infos = [memo[w] for w, _ in groups]
    au.append(sum(min(i.anchor_union.size, conj.ANCHOR_CLIP)
                  for i in infos))
au = np.array(au)
print(f"[lab] sum clipped anchors/query p50={np.median(au):.0f} "
      f"p90={np.percentile(au, 90):.0f} max={au.max()}", flush=True)

# stacking cost (ev/an bitsets are copied per call)
t0 = time.perf_counter()
for qn, groups, prep in cases:
    infos = [memo[w] for w, _ in groups]
    np.stack([inf.ev_bits for inf in infos])
    np.stack([inf.an_bits for inf in infos])
stack_ms = (time.perf_counter() - t0) / len(cases) * 1e3
print(f"[lab] bitset np.stack overhead: {stack_ms:.3f}ms/call", flush=True)
