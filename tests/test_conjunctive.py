"""Token-conjunctive candidate tier (index/conjunctive.py).

Multi-word queries whose best doc matches EVERY token — one of them only
partially — rank tier-3 in coverage/fusion but can sit at Stage-1 rank
500+ behind docs matching a single common word perfectly. The
conjunctive pool must surface them into the depth budget, and oracle
(deep) candidate sets must nest production ones.
"""

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.index.conjunctive import conjunctive_pool


@pytest.fixture(scope="module")
def engine():
    # 1800 filler docs match 'common' perfectly; one HIGH-id doc matches
    # both words of the query "common tailword" (second word only as a
    # prefix in the query) and would be buried at Stage-1 rank > 500.
    docs = [Document(i, f"filler number {i} common") for i in range(1800)]
    docs.append(Document(1800, "common tailword entry"))
    docs.append(Document(1801, "another tailword thing"))
    eng = SearchEngine.create_default()
    eng.index_documents(docs)
    return eng


def _pool(engine, text):
    model = engine.vector_model
    wm = engine._pipeline._word_matcher
    groups = wm.lookup_parts_grouped(text, True)
    prep = model.prepare_stage1(text)
    return conjunctive_pool(model, groups, prep)


def test_pool_contains_all_token_doc(engine):
    pool = _pool(engine, "common tail")
    keys = engine.vector_model.doc_keys_arr[pool]
    assert 1800 in keys.tolist()


def test_pool_excludes_single_token_docs(engine):
    # docs matching only 'common' (no 'tail' evidence) must not flood it
    pool = _pool(engine, "common tail")
    keys = set(engine.vector_model.doc_keys_arr[pool].tolist())
    assert keys <= {1800}, sorted(keys)[:10]


def test_single_word_query_disabled(engine):
    assert _pool(engine, "common").size == 0


def test_search_finds_buried_conjunctive_doc(engine):
    res = engine.search(Query("common tail", 10))
    got = [r.document_id for r in res.records]
    assert 1800 in got, got


def test_deep_oracle_nests_production(engine):
    prod = engine.search(Query("common tail", 10))
    oq = Query("common tail", 10)
    oq.coverage_depth = 2000
    orac = engine.search(oq)
    want = [r.document_id for r in orac.records]
    got = {r.document_id for r in prod.records}
    hits = sum(1 for d in want if d in got)
    assert hits >= 9, (want, sorted(got))


def test_pool_deterministic_and_capped(engine):
    a = _pool(engine, "common tail")
    b = _pool(engine, "common tail")
    assert np.array_equal(a, b)
    from infidex_tpu.index.conjunctive import CONJ_CAP

    assert a.size <= CONJ_CAP


def test_batch_and_single_agree(engine):
    qs = ["common tail", "another tail", "filler comm"]
    batch = engine.search_batch([Query(q, 10) for q in qs])
    for q, br in zip(qs, batch):
        sr = engine.search(Query(q, 10))
        assert [r.document_id for r in sr.records] == \
               [r.document_id for r in br.records], q


def test_native_pool_parity(engine, monkeypatch):
    """The one-call C++ pool (native.conj_pool_native) must be
    byte-identical to the pure-numpy path for ranked, unranked, and
    typo-bearing queries."""
    from infidex_tpu import native

    if not native.available:
        pytest.skip("native library unavailable")
    model = engine.vector_model
    wm = engine._pipeline._word_matcher
    for text in ["common tail", "another tailword", "comon tailwrd",
                 "filler common tail", "number entry"]:
        groups = wm.lookup_parts_grouped(text, True)
        for prep in (model.prepare_stage1(text), None):
            monkeypatch.setenv("INFIDEX_TPU_CONJ_PY", "1")
            model._conj_token_evidence = None
            model._conj_pool_memo = None   # don't let the py pool satisfy
            py = conjunctive_pool(model, groups, prep)
            monkeypatch.delenv("INFIDEX_TPU_CONJ_PY")
            model._conj_token_evidence = None
            model._conj_pool_memo = None   # ...the native call via memo
            nat = conjunctive_pool(model, groups, prep)
            assert np.array_equal(py, nat), (text, prep is None, py, nat)


def test_pool_memo_hits_and_invalidates(engine):
    """The finished-pool memo returns the identical array for a repeat
    (words, scoring-terms) key and drops wholesale when the index is
    rebuilt (keyed on BuiltIndex identity)."""
    model = engine.vector_model
    wm = engine._pipeline._word_matcher
    text = "common tail"
    groups = wm.lookup_parts_grouped(text, True)
    prep = model.prepare_stage1(text)
    model._conj_pool_memo = None
    first = conjunctive_pool(model, groups, prep)
    assert conjunctive_pool(model, groups, prep) is first   # memo hit
    old_built = model.built
    model.build_inverted_lists()                            # re-finalize
    assert model.built is not old_built or \
        model._conj_pool_memo[0] is old_built
    groups2 = wm.lookup_parts_grouped(text, True)
    prep2 = model.prepare_stage1(text)
    again = conjunctive_pool(model, groups2, prep2)
    assert np.array_equal(np.sort(first), np.sort(again))
    assert again is not first                               # fresh entry
