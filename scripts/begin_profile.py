"""cProfile the gate+begin (coverage job construction) host path at 1M.

The per-stage lab showed gate+begin at ~114ms/64-batch — the largest
non-native host cost. This isolates _coverage_begin_fast (and its
callees: WM partition, class prior, conj dedupe, head interleave) with
warm memos, mirroring the serving batch loop.

Usage: JAX_PLATFORMS=cpu python scripts/begin_profile.py [n_docs] [n_queries]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

bench._setup_cache()
from infidex_tpu import Document, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 256

t0 = time.perf_counter()
titles = bench.make_corpus(N_DOCS)
eng = SearchEngine.create_default()
eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
print(f"[begin] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s",
      flush=True)

queries = bench.make_queries(titles, N_QUERIES)
model = eng._vector_model
pipe = eng._pipeline
setup = eng._coverage_setup

norm = model.tokenizer.text_normalizer
texts = [norm.normalize(q.strip().lower()) if norm else q for q in queries]

# Stage-1 arrays per query (via whichever route serving uses) — computed
# once OUTSIDE the profile so only the begin path is measured.
jobs = []
for t in texts:
    prep = model.prepare_stage1(t)
    if prep is None:
        continue
    out = model.stage1_tiered_maybe(prep, 500)
    if out is None:
        out = model.stage1_backend.search_batch(
            [prep], 500, total_docs=model.documents.count,
            stop_term_limit=model.stop_term_limit)[0]
    s1 = model.finish_stage1_arrays(out[0], out[1])
    lim = out[2] if len(out) > 2 else None
    jobs.append((t, s1, lim))
print(f"[begin] stage-1 done for {len(jobs)} queries", flush=True)


def one_pass():
    for t, s1, lim in jobs:
        pipe._wm_tls.prefetch = {}
        pipe._coverage_begin_fast(t, setup, 500, s1, lim_ids=lim)


one_pass()   # warm memos
t0 = time.perf_counter()
one_pass()
wall = time.perf_counter() - t0
print(f"[begin] warm begin pass: {wall:.2f}s "
      f"({wall/len(jobs)*1000:.2f}ms/q)", flush=True)

pr = cProfile.Profile()
pr.enable()
one_pass()
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("tottime").print_stats(24)
print(s.getvalue())
