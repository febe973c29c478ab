"""Diagnose WHERE lost oracle-top-10 docs sit in each candidate generator.

For every production-lost doc (oracle depth-20000 top-10 not in
production top-10), reports per generator:
  - s1:    rank in the exact full-depth Stage-1 ordering
  - wm:    best (part_index, rank_in_part) over all WordMatcher parts
           containing the doc, per query token
  - conj:  rank in the PRE-clip conjunctive pool (-1 if absent)
  - lim:   present in the low-id-matcher rows

Usage: python scripts/loss_diag.py [n_docs] [per_mode] [modes...]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench

bench._setup_cache()   # persistent XLA compile cache (TPU runs)
from infidex_tpu import Document, Query, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
PER_MODE = int(sys.argv[2]) if len(sys.argv) > 2 else 16
MODES = sys.argv[3:] or ["typo", "multi"]
ORACLE_DEPTH = min(N_DOCS, 20_000)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    t0 = time.perf_counter()
    titles = bench.make_corpus(N_DOCS)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    log(f"[diag] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s")
    model = eng.vector_model
    wm = eng._pipeline._word_matcher
    norm = model.tokenizer.text_normalizer

    import scripts.recall_study as rs
    queries = rs.make_mode_queries(titles, PER_MODE)

    for mode in MODES:
        for q in queries[mode]:
            prod = {r.document_id for r in eng.search(Query(q, 10)).records}
            oq = Query(q, 10)
            oq.coverage_depth = ORACLE_DEPTH
            # UNCLIPPED oracle (full host postings, no champion clipping) —
            # same routing force as bench._recall_unclipped
            from infidex_tpu.index.vector_model import VectorModel
            old_or = (VectorModel.HOST_S1_MAX_LANES,
                      VectorModel.HOST_S1_MAX_BATCH)
            VectorModel.HOST_S1_MAX_LANES = 1 << 62
            try:
                want = [r.document_id for r in eng.search(oq).records]
            finally:
                (VectorModel.HOST_S1_MAX_LANES,
                 VectorModel.HOST_S1_MAX_BATCH) = old_or
            miss = [d for d in want if d not in prod]
            if not miss:
                continue
            t = norm.normalize(q.strip().lower()) if norm else q
            prep = model.prepare_stage1(t)
            groups = wm.lookup_parts_grouped(t, True)
            # exact deep stage-1 ranking
            out = model.stage1_tiered_maybe(prep, ORACLE_DEPTH)
            if out is None:
                out = model.stage1_backend.search_batch(
                    [prep], ORACLE_DEPTH,
                    total_docs=model.documents.count,
                    stop_term_limit=model.stop_term_limit)[0]
            s1_ids = np.asarray(out[1])
            from infidex_tpu.index.conjunctive import (
                conjunctive_pool, CONJ_CAP)
            import infidex_tpu.index.conjunctive as cj
            old_cap = cj.CONJ_CAP
            cj.CONJ_CAP = 10**9      # pre-clip pool
            model._conj_pool_memo = None   # memo ignores the cap override
            pool = conjunctive_pool(model, groups, prep)
            cj.CONJ_CAP = old_cap
            model._conj_pool_memo = None
            for d in miss:
                doc = eng.get_document(d)
                iid = model.documents.get_document_by_public_key(d).id
                rank_or = want.index(d)
                s1r = np.where(s1_ids == iid)[0]
                s1r = int(s1r[0]) if s1r.size else -1
                wm_hits = []
                for w, parts in groups:
                    for pi, p in enumerate(parts):
                        j = np.searchsorted(p, iid)
                        if j < p.size and p[j] == iid:
                            wm_hits.append((w, pi, int(j), int(p.size)))
                cr = np.where(pool == iid)[0]
                cr = int(cr[0]) if cr.size else -1
                print(f"[{mode}] q={q!r} lost key={d} oracle#{rank_or} "
                      f"s1_rank={s1r} conj_rank={cr} "
                      f"wm={wm_hits[:4]} text={doc.indexed_text[:60]!r}",
                      flush=True)
    log(f"[diag] done in {time.perf_counter()-t0:.0f}s")


if __name__ == "__main__":
    main()
