"""Native bulk index build == per-document Python build, exactly.

The C++ bulk builder (native/bulk.py, _lib.cpp) must reproduce the term
dictionary (ids in first-seen order), df counters, CSR postings with the
increment_usage/first_cycle_add accumulation, the WordMatcher maps and the
positional prefix index — byte for byte. Verified structurally and through
end-to-end search parity, including multi-field weighted docs and
segmented docs (continuation padding)."""

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.api.fields import DocumentFields, Field, Weight

pytest.importorskip("infidex_tpu.native.bulk")
from infidex_tpu.native.bulk import bulk_available

pytestmark = pytest.mark.skipif(not bulk_available(),
                                reason="native bulk builder unavailable")

TITLES = [
    "The Shawshank Redemption", "The Godfather", "Pulp Fiction",
    "The Dark Knight", "Schindler's List", "Zelená škola",
    "Star Wars: Episode IV - A New Hope", "Alien", "Aliens",
    "Dr. Strangelove, or: How I Learned to Stop Worrying",
    "Once Upon a Time... in Hollywood", "Amélie", "WALL·E",
    "Léon: The Professional", "The Good, the Bad and the Ugly",
] * 20  # repeats exercise duplicate-token and df paths


def _multifield_doc(i, title, body, year):
    f = DocumentFields()
    f.add_field(Field("title", title, Weight.HIGH))
    f.add_field(Field("body", body, Weight.LOW))
    f.add_field(Field("year", year, Weight.LOW, indexable=False,
                      filterable=True))
    return Document(i, f)


def _build_engines(docs_factory):
    bulk = SearchEngine.create_default()
    bulk.index_documents(docs_factory())
    assert bulk.vector_model._bulk_csr is not None or \
        len(bulk.vector_model.term_dict.postings) > 0

    perdoc = SearchEngine.create_default()
    # Force the per-document path by shrinking below the bulk threshold:
    # index in two calls (second call sees a non-empty dict -> per-doc).
    docs = docs_factory()
    perdoc._can_bulk_index = lambda dl: False
    perdoc.index_documents(docs)
    return bulk, perdoc


def _docs_simple():
    return [Document(i, t) for i, t in enumerate(TITLES)]


def _docs_multifield():
    return [_multifield_doc(i, t, f"body words number {i % 7} alpha", 1990 + i % 30)
            for i, t in enumerate(TITLES)]


def _docs_segmented():
    out = []
    for i, t in enumerate(TITLES[:100]):
        out.append(Document(i, t))
        if i % 5 == 0:
            seg = Document(i, t + " continued segment text")
            seg.segment_number = 1
            out.append(seg)
    return out


@pytest.mark.parametrize("factory", [_docs_simple, _docs_multifield,
                                     _docs_segmented])
def test_index_structures_identical(factory):
    bulk, perdoc = _build_engines(factory)
    mb, mp = bulk.vector_model, perdoc.vector_model

    assert mb.built.terms == mp.built.terms
    np.testing.assert_array_equal(mb.built.df, mp.built.df)
    np.testing.assert_array_equal(mb.built.term_offsets, mp.built.term_offsets)
    np.testing.assert_array_equal(mb.built.postings_docs, mp.built.postings_docs)
    np.testing.assert_array_equal(mb.built.postings_weights,
                                  mp.built.postings_weights)
    np.testing.assert_allclose(mb.built.doc_lengths, mp.built.doc_lengths)
    assert abs(mb.built.avgdl - mp.built.avgdl) < 1e-6

    # WordMatcher maps
    wb, wp = bulk.word_matcher, perdoc.word_matcher
    for attr in ("_exact", "_ld1", "_affix_words"):
        db, dp = getattr(wb, attr), getattr(wp, attr)
        assert set(db.keys()) == set(dp.keys()), attr
        for k in dp:
            np.testing.assert_array_equal(np.asarray(db[k]),
                                          np.asarray(dp[k]), err_msg=f"{attr}:{k}")

    # Positional prefix index
    sb, sp = mb.short_query_index, mp.short_query_index
    kb = {k for k, _ in sb.all_prefixes()}
    kp = {k for k, _ in sp.all_prefixes()}
    assert kb == kp
    for k in kp:
        a = np.asarray([list(r) for r in sb.get_posting_list(k)])
        b = np.asarray([list(r) for r in sp.get_posting_list(k)])
        np.testing.assert_array_equal(a, b, err_msg=k)


def test_search_results_identical():
    bulk, perdoc = _build_engines(_docs_simple)
    for q in ["shawshank", "shawshenk", "the godfathr", "zelena skola",
              "star wars", "alien", "a", "th", "once upon", "walle"]:
        ra = [(e.document_id, round(float(e.score), 4), e.tiebreaker)
              for e in bulk.search(Query(q, 10)).records]
        rb = [(e.document_id, round(float(e.score), 4), e.tiebreaker)
              for e in perdoc.search(Query(q, 10)).records]
        assert ra == rb, q


def test_incremental_after_bulk():
    """index_document after a bulk build materializes the CSR and keeps
    accumulating with identical semantics."""
    bulk, perdoc = _build_engines(_docs_simple)
    for eng in (bulk, perdoc):
        eng.index_document(Document(10_000, "Freshly Added Shawbulk Doc"))
        eng.calculate_weights()
    mb, mp = bulk.vector_model, perdoc.vector_model
    assert mb.built.terms == mp.built.terms
    np.testing.assert_array_equal(mb.built.postings_docs,
                                  mp.built.postings_docs)
    ra = [e.document_id for e in bulk.search(Query("shawbulk", 5)).records]
    rb = [e.document_id for e in perdoc.search(Query("shawbulk", 5)).records]
    assert ra == rb
    assert ra[0] == 10_000


def test_save_load_after_bulk(tmp_path):
    bulk, _ = _build_engines(_docs_simple)
    p = str(tmp_path / "bulk.bin")
    bulk.save(p)
    loaded = SearchEngine.load(p)
    for q in ["shawshank", "godfather", "alien"]:
        ra = [(e.document_id, round(float(e.score), 4))
              for e in bulk.search(Query(q, 10)).records]
        rb = [(e.document_id, round(float(e.score), 4))
              for e in loaded.search(Query(q, 10)).records]
        assert ra == rb, q
