"""Query timeout enforcement (Api/Query.cs:75 TimeOutLimitMilliseconds,
Api/Result.cs:34 DidTimeOut).

The reference clamps the limit (SearchEngine.cs:290) but never enforces
it; this engine enforces EXPLICITLY-set deadlines between pipeline stages
and per coverage chunk, returning partial (Stage-1-only) results flagged
with did_time_out. Implicit defaults are not enforced so rankings match
the reference under arbitrarily slow (cold-compile) conditions."""

import pytest

from infidex_tpu import Document, Query, SearchEngine


@pytest.fixture(scope="module")
def engine():
    eng = SearchEngine.create_default()
    docs = [Document(i, f"redemption story number {i} shawshank tale")
            for i in range(600)]
    docs += [Document(1000 + i, f"galaxy quest episode {i}")
             for i in range(600)]
    eng.index_documents(docs)
    # warm the pipeline so the timing-sensitive assertions below do not
    # race compilation
    eng.search(Query("redemption", 10))
    return eng


def test_default_timeout_not_enforced(engine):
    q = Query("redemption", 10)
    assert q.time_out_limit_milliseconds == 1000
    assert not q.timeout_enforced
    res = engine.search(q)
    assert not res.did_time_out
    assert res.records


def test_explicit_1ms_timeout_returns_partial_flagged(engine):
    q = Query("redemption", 10)
    q.time_out_limit_milliseconds = 1
    assert q.timeout_enforced
    res = engine.search(q)
    assert res.did_time_out
    # partial results: Stage-1 ranking still returns matching docs
    assert res.records
    titles = [engine.get_document(r.document_id).indexed_text
              for r in res.records]
    assert any("redemption" in t for t in titles)


def test_explicit_1ms_timeout_batch(engine):
    q1 = Query("redemption", 10)
    q1.time_out_limit_milliseconds = 1
    q2 = Query("galaxy", 10)
    out = engine.search_batch([q1, q2])
    assert out[0].did_time_out
    assert out[0].records
    assert not out[1].did_time_out
    assert out[1].records


def test_generous_timeout_not_flagged(engine):
    q = Query("redemption", 10)
    q.time_out_limit_milliseconds = 10000
    res = engine.search(q)
    assert not res.did_time_out
    assert res.records


def test_timeout_clamped_to_10s(engine):
    q = Query("redemption", 10)
    q.time_out_limit_milliseconds = 99999
    res = engine.search(q)   # clamp happens inside search()
    assert not res.did_time_out


def test_copy_preserves_explicitness():
    q = Query("x", 5)
    assert not q.copy().timeout_enforced
    q.time_out_limit_milliseconds = 50
    assert q.copy().timeout_enforced
    assert q.copy().time_out_limit_milliseconds == 50
