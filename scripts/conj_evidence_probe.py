"""Why is 'Onfael Cekachel' (key 817043) not a conjunctive candidate
for 'onsael cee'? Walk the evidence chain step by step at 1M.

Usage: python scripts/conj_evidence_probe.py [n_docs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from infidex_tpu import Document, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
Q = "onsael cee"
LOST = [817043, 495717, 894880, 189336, 998129, 630370]


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    titles = bench.make_corpus(N_DOCS)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    log(f"[probe] indexed {N_DOCS}")
    model = eng.vector_model
    built = model.built
    wm = eng._pipeline._word_matcher
    norm = model.tokenizer.text_normalizer
    t = norm.normalize(Q.strip().lower()) if norm else Q
    groups = wm.lookup_parts_grouped(t, True)

    from infidex_tpu.index.conjunctive import (
        _token_evidence, ANCHOR_CLIP)

    infos = {}
    for w, parts in groups:
        inf = _token_evidence(model, w, parts)
        infos[w] = inf
        log(f"[tok] '{w}': anchors={[len(a) for a in inf.anchors]} "
            f"union={inf.anchor_union.size} gram_tids={len(inf.gram_tids)}")
        for g in set(model.tokenizer.tokenize_for_search(w)):
            tid = built.term_to_id.get(g, -1)
            df = int(built.df[tid]) if tid >= 0 else -1
            log(f"    gram {g!r}: tid={tid} df={df}")

    from infidex_tpu.index.conjunctive import conjunctive_pool
    prep = model.prepare_stage1(t)
    pool_nat = np.asarray(conjunctive_pool(model, groups, prep))
    model._conj_pool_memo = None
    os.environ["INFIDEX_TPU_CONJ_PY"] = "1"
    pool_py = np.asarray(conjunctive_pool(model, groups, prep))
    del os.environ["INFIDEX_TPU_CONJ_PY"]
    log(f"[pool] native={pool_nat.size} py={pool_py.size} "
        f"same_set={set(pool_nat.tolist()) == set(pool_py.tolist())}")

    for ext in LOST:
        iid = model.documents.first_live_id(ext)
        doc = model.documents.get_document_by_public_key(ext)
        log(f"\n[lost] ext={ext} iid={iid} "
            f"text='{getattr(doc, 'indexed_text', '?') if doc else '?'}' "
            f"in_nat={iid in pool_nat} in_py={iid in pool_py}")
        for w, inf in infos.items():
            in_union = bool(np.isin(np.int32(iid), inf.anchor_union))
            in_grams = []
            for tid in inf.gram_tids:
                p = built.postings_for(int(tid))[0]
                if np.isin(np.int32(iid), p):
                    # find the gram string
                    in_grams.append(int(tid))
            rank = (int(np.searchsorted(inf.anchor_union, iid))
                    if in_union else -1)
            log(f"  '{w}': anchor_union={in_union} (sorted pos {rank}, "
                f"clip {ANCHOR_CLIP}) gram_tids_hit={in_grams}")


if __name__ == "__main__":
    main()
