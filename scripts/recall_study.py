"""Where does depth-500 recall go? Loss breakdown by query mode.

For each query mode (exact / typo / multi-term / prefix), compares the
production pipeline (coverage_depth=500) against a deep oracle
(depth=min(N, 20000)) and classifies every lost oracle-top-10 doc:

  - "not-candidate": the doc never entered the production coverage
    worklist (candidate-generation loss: stage-1 truncation or
    WordMatcher head-clipping) — fixable by better candidate selection.
  - "ranked-out": the doc was scored but lost the coverage rerank
    (inherent depth/scoring behavior).

Usage: python scripts/recall_study.py [n_docs] [per_mode] [unclipped]
Pass "unclipped" as the third arg to score the oracle on FULL host
postings (no champion clipping — bench._recall_unclipped's routing), the
honest per-mode number VERDICT r4 task #7 asks for at 1M.
Needs PYTHONPATH=/root/repo when run by path.
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

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
PER_MODE = int(sys.argv[2]) if len(sys.argv) > 2 else 24
UNCLIPPED = "unclipped" in sys.argv[3:]
#: e.g. "modes=multi" or "modes=multi,typo" limits the sweep
ONLY_MODES = None
for a in sys.argv[3:]:
    if a.startswith("modes="):
        ONLY_MODES = set(a[6:].split(","))
ORACLE_DEPTH = min(N_DOCS, 20_000)
BATCH = 32


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_mode_queries(titles, per_mode):
    rng = random.Random(123)
    modes = {"exact": [], "typo": [], "multi": [], "prefix": []}
    while any(len(v) < per_mode for v in modes.values()):
        title = rng.choice(titles)
        words = [w for w in title.lower().split() if len(w) >= 4]
        if not words:
            continue
        w = rng.choice(words)
        if len(modes["exact"]) < per_mode:
            modes["exact"].append(w)
        elif len(modes["typo"]) < per_mode:
            modes["typo"].append(bench.typo(w, rng))
        elif len(modes["multi"]) < per_mode:
            w2 = rng.choice(title.lower().split())
            modes["multi"].append(f"{w} {w2[:3]}")
        else:
            modes["prefix"].append(w[: max(3, len(w) - 2)])
    return modes


def production_worklist(engine, text, depth=500):
    """The doc KEYS the production coverage stage would score (fast path)."""
    pipe = engine._pipeline
    model = engine.vector_model
    norm = model.tokenizer.text_normalizer
    t = norm.normalize(text.strip().lower()) if norm else text
    setup = engine._coverage_setup
    prep = model.prepare_stage1(t)
    if prep is None:
        return set()
    out = model.stage1_tiered_maybe(prep, depth)
    if out is None:
        out = model.stage1_backend.search_batch(
            [prep], depth, total_docs=model.documents.count,
            stop_term_limit=model.stop_term_limit)[0]
    s1 = model.finish_stage1_arrays(out[0], out[1])
    lim = out[2] if len(out) > 2 else None
    pipe._wm_tls.prefetch = {}
    job = pipe._coverage_begin_fast(t, setup, depth, s1, lim_ids=lim)
    ids = job["worklist_ids"]
    ok = (ids >= 0) & (ids < model.doc_keys_arr.size)
    return set(model.doc_keys_arr[ids[ok]].tolist())


def main():
    t0 = time.perf_counter()
    titles = bench.make_corpus(N_DOCS)
    engine = SearchEngine.create_default()
    engine.index_documents([Document(i, t) for i, t in enumerate(titles)])
    log(f"[study] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s")

    modes = make_mode_queries(titles, PER_MODE)
    t0 = time.perf_counter()
    for mode, queries in modes.items():
        if ONLY_MODES is not None and mode not in ONLY_MODES:
            continue
        hits = total = 0
        lost_noncand = lost_ranked = 0
        for lo in range(0, len(queries), BATCH):
            chunk = queries[lo : lo + BATCH]
            prod_rs = engine.search_batch([Query(q, 10) for q in chunk])
            oracle_qs = []
            for q in chunk:
                oq = Query(q, 10)
                oq.coverage_depth = ORACLE_DEPTH
                oracle_qs.append(oq)
            if UNCLIPPED:
                from infidex_tpu.index.vector_model import VectorModel

                old = (VectorModel.HOST_S1_MAX_LANES,
                       VectorModel.HOST_S1_MAX_BATCH)
                VectorModel.HOST_S1_MAX_LANES = 1 << 62
                VectorModel.HOST_S1_MAX_BATCH = 8
                try:
                    orac_rs = []
                    for o in range(0, len(oracle_qs), 8):
                        orac_rs.extend(
                            engine.search_batch(oracle_qs[o : o + 8]))
                finally:
                    (VectorModel.HOST_S1_MAX_LANES,
                     VectorModel.HOST_S1_MAX_BATCH) = old
            else:
                orac_rs = engine.search_batch(oracle_qs)
            for q, pr, orr in zip(chunk, prod_rs, orac_rs):
                want = [r.document_id for r in orr.records]
                if not want:
                    continue
                got = {r.document_id for r in pr.records}
                miss = [d for d in want if d not in got]
                hits += len(want) - len(miss)
                total += len(want)
                if miss:
                    wl = production_worklist(engine, q)
                    for d in miss:
                        if d in wl:
                            lost_ranked += 1
                        else:
                            lost_noncand += 1
        rec = hits / total if total else 1.0
        print(f"{mode:7s} recall@10={rec:.3f}  lost: not-candidate="
              f"{lost_noncand} ranked-out={lost_ranked} (of {total})",
              flush=True)
    log(f"[study] measured in {time.perf_counter()-t0:.0f}s")


if __name__ == "__main__":
    main()
