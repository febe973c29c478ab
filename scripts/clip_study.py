"""Clipping-loss study: top-10 of clipped vs UNCLIPPED engines, 300k docs."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import bench
bench._setup_cache()   # persistent XLA compile cache (TPU runs)
from infidex_tpu import Document, Query, SearchEngine

n = 300_000
titles = bench.make_corpus(n)
queries = bench.make_queries(titles, 48)

def build(cap):
    os.environ["INFIDEX_TPU_DEVICE_TERM_CAP"] = str(cap)
    import importlib
    import infidex_tpu.index.builder as b
    b.DEVICE_TERM_CAP = cap
    e = SearchEngine.create_default()
    e.index_documents([Document(i, t) for i, t in enumerate(titles)])
    return e

e_clip = build(2048)
res_clip = [ [r.document_id for r in e_clip.search(Query(q, 10)).records] for q in queries ]
del e_clip
e_full = build(0)
res_full = [ [r.document_id for r in e_full.search(Query(q, 10)).records] for q in queries ]
hits = total = exact_rank = 0
for a, b_ in zip(res_clip, res_full):
    sa = set(a)
    total += len(b_)
    hits += sum(1 for d in b_ if d in sa)
    exact_rank += int(a == b_)
print(f"clip-vs-unclipped recall@10: {hits/max(total,1):.4f}  "
      f"identical-rankings: {exact_rank}/{len(queries)}")
