"""Pre-filtering: selective filters intersect into Stage-1 scoring.

VERDICT r02 #6: post-filtering 500 covered candidates starves selective
filters (a 1%-selective filter leaves ~5 results from a 500-candidate
page). Pre-filtering zeroes non-matching docs BEFORE the device top-k, so
the coverage_depth budget is spent entirely on docs that can actually be
returned. Reference post-filter semantics (ResultProcessor.cs:35-70)
still run on the output; DerivedFilter and sharded serving stay
post-filter-only."""

import os

import pytest

from infidex_tpu import (Document, DocumentFields, Filter, Query,
                         SearchEngine, Weight)


def _docs(n=1200, rare_lo=1100):
    docs = []
    for i in range(n):
        fields = DocumentFields()
        fields.add_field("title", f"common story {i}", weight=Weight.HIGH)
        genre = "rare" if i >= rare_lo else "bulk"
        fields.add_field("genre", genre, indexable=False, filterable=True,
                         facetable=True)
        docs.append(Document(i, fields))
    return docs


@pytest.fixture(scope="module")
def engine():
    eng = SearchEngine.create_default()
    eng.index_documents(_docs())
    return eng


def _search(engine, text, filt, depth=500, facets=False):
    q = Query(text, 50)
    q.filter = filt
    q.coverage_depth = depth
    q.enable_facets = facets
    return engine.search(q)


def test_prefilter_fills_page_where_postfilter_starves(engine):
    filt = Filter.parse("genre = 'rare'")
    res = _search(engine, "common", filt)
    # 100 rare docs exist; the filtered page must be full even though the
    # rare docs are tie-ranked at the END of the unfiltered top-500
    assert len(res.records) == 50
    got = {r.document_id for r in res.records}
    assert all(k >= 1100 for k in got)

    os.environ["INFIDEX_TPU_PREFILTER"] = "0"
    try:
        res_post = _search(engine, "common", filt)
    finally:
        del os.environ["INFIDEX_TPU_PREFILTER"]
    # post-filter finds at most what survived the unfiltered top-500
    assert len(res_post.records) <= len(res.records)


def test_prefilter_results_all_match_filter_and_facets(engine):
    filt = Filter.parse("genre = 'rare'")
    res = _search(engine, "common", filt, facets=True)
    assert res.facets and dict(res.facets["genre"]) == {
        "rare": len(res.records)}


def test_prefilter_matches_postfilter_for_majority_filter(engine):
    # A filter that keeps the docs dominating the unfiltered page: both
    # modes rank the same candidates with the same normalization (the
    # global BM25 max is a bulk doc), so the pages must be identical.
    filt = Filter.parse("genre = 'bulk'")
    a = _search(engine, "common", filt, depth=2000)
    os.environ["INFIDEX_TPU_PREFILTER"] = "0"
    try:
        b = _search(engine, "common", filt, depth=2000)
    finally:
        del os.environ["INFIDEX_TPU_PREFILTER"]
    assert a.records and [r.document_id for r in a.records] == \
        [r.document_id for r in b.records]


def test_prefilter_batch_groups_by_filter(engine):
    rare = Filter.parse("genre = 'rare'")
    bulk = Filter.parse("genre = 'bulk'")
    q1 = Query("common", 20); q1.filter = rare
    q2 = Query("common", 20); q2.filter = bulk
    q3 = Query("common", 20)
    out = engine.search_batch([q1, q2, q3])
    assert all(k >= 1100 for k in
               {r.document_id for r in out[0].records})
    assert all(k < 1100 for k in
               {r.document_id for r in out[1].records})
    assert len(out[2].records) == 20


def test_unfiltered_queries_unchanged(engine):
    a = engine.search(Query("common story 7", 10))
    assert a.records
