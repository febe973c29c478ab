"""Probe the conjunctive pool's (strong, tok_n) class structure at 1M
for the multi-term queries loss_diag flagged, to explain why the
first-class slice extension (ConjPool.first_class) did not move recall.

Prints per query: pool size, first_class as computed, the first 12
(strong, tok_n) class runs with lengths, and where the known-lost docs
sit (rank + their class).

Usage: python scripts/conj_class_probe.py [n_docs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from infidex_tpu import Document, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

QUERIES = {
    "viussador dor": [745273, 974292, 422169, 42300, 240636],
    "elquaarul sal": [165353],
    "kaviwence yor": [2162],
    "onsael cee": [],
}


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    titles = bench.make_corpus(N_DOCS)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    log(f"[probe] indexed {N_DOCS}")
    model = eng.vector_model
    wm = eng._pipeline._word_matcher
    norm = model.tokenizer.text_normalizer

    from infidex_tpu.index.conjunctive import conjunctive_pool
    from infidex_tpu.native import member_any_into

    for q, lost in QUERIES.items():
        t = norm.normalize(q.strip().lower()) if norm else q
        prep = model.prepare_stage1(t)
        groups = wm.lookup_parts_grouped(t, True)
        pool = conjunctive_pool(model, groups, prep)
        fc = getattr(pool, "first_class", None)
        log(f"\n[q] '{q}' pool={pool.size} first_class={fc}")
        if pool.size == 0:
            continue
        built = model.built
        memo = model._conj_token_evidence[1]
        strong = np.zeros(pool.size, np.int32)
        p64 = np.ascontiguousarray(pool, np.int64)
        order = np.argsort(p64, kind="stable")
        sorted_p = np.ascontiguousarray(p64[order])
        for w, _ in groups:
            inf = memo.get(w)
            if inf is None:
                log(f"  MEMO MISS for word '{w}'")
                continue
            hit = np.zeros(pool.size, np.uint8)
            member_any_into(inf.anchor_union, sorted_p, hit)
            strong[order] += hit
        tables = getattr(model, "coverage_tables", None)
        tok_n = tables.tok_count_host[np.minimum(
            p64, tables.tok_count_host.size - 1)].astype(np.int32)
        # class runs
        key = strong.astype(np.int64) * 1000 + tok_n
        change = np.flatnonzero(np.diff(key)) + 1
        bounds = np.concatenate([[0], change, [pool.size]])
        log("  classes (strong, tok_n, len, start):")
        for i in range(min(12, bounds.size - 1)):
            s, e = int(bounds[i]), int(bounds[i + 1])
            log(f"    #{i}: strong={strong[s]} tok_n={tok_n[s]} "
                f"len={e-s} start={s}")
        # internal ids for lost external keys
        for ext in lost:
            iid = model.documents.first_live_id(ext)
            if iid is None:
                iid = ext
            r = np.flatnonzero(p64 == iid)
            if r.size:
                ri = int(r[0])
                ci = int(np.searchsorted(bounds, ri, "right") - 1)
                log(f"  lost ext={ext} iid={iid} rank={ri} class#{ci} "
                    f"(strong={strong[ri]} tok_n={tok_n[ri]})")
            else:
                log(f"  lost ext={ext} iid={iid} NOT in pool")


if __name__ == "__main__":
    main()
