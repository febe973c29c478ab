"""search_many (software-pipelined sub-batches) parity with search_batch.

The pipelined scheduler interleaves generator segments of several
batches on one thread (scoring/pipeline.py execute_batches_pipelined);
these tests pin that interleaving changes NOTHING about per-query
results — scores, ids, order — versus the serial batched path.
"""

import random

import pytest

from infidex_tpu import Document, Query, SearchEngine

WORDS = ["galaxy", "quest", "matrix", "revolution", "dark", "knight",
         "returns", "phantom", "menace", "empire", "strikes", "back",
         "godfather", "inception", "interstellar", "gravity", "alien",
         "predator", "terminator", "avatar", "titanic", "casablanca"]


def _mk_engine(n_docs=3000, seed=7):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        k = rng.randint(1, 4)
        docs.append(Document(i, " ".join(rng.choice(WORDS)
                                         for _ in range(k))))
    eng = SearchEngine.create_default()
    eng.index_documents(docs)
    return eng


def _keys(res):
    return [(r.document_id, round(r.score, 4)) for r in res.records]


@pytest.fixture(scope="module")
def engine():
    return _mk_engine()


def test_search_many_matches_search_batch(engine):
    rng = random.Random(11)
    queries = []
    for _ in range(40):
        w = rng.choice(WORDS)
        kind = rng.randrange(5)
        if kind == 0:
            queries.append(w)                      # exact
        elif kind == 1:                            # typo
            j = rng.randrange(len(w))
            queries.append(w[:j] + "x" + w[j + 1:])
        elif kind == 2:                            # multi-word
            queries.append(w + " " + rng.choice(WORDS))
        elif kind == 3:
            queries.append(w[: max(2, len(w) // 2)])   # prefix
        else:
            queries.append(w[:1])                  # 1-char short query

    serial = []
    for lo in range(0, len(queries), 8):
        serial.extend(engine.search_batch(
            [Query(q, 10) for q in queries[lo:lo + 8]]))
    piped = engine.search_many([Query(q, 10) for q in queries],
                               batch_size=8, pipeline_depth=3)
    assert len(serial) == len(piped)
    for q, a, b in zip(queries, serial, piped):
        assert _keys(a) == _keys(b), f"divergence on {q!r}"


def test_search_many_single_sub_batch(engine):
    # Degenerate case: everything fits one sub-batch — must equal
    # search_batch exactly (same code path, depth-1 pipeline).
    qs = ["galaxy", "quest xyz", "mat", "empire strikes"]
    a = engine.search_batch([Query(q, 10) for q in qs])
    b = engine.search_many([Query(q, 10) for q in qs], batch_size=64)
    for x, y in zip(a, b):
        assert _keys(x) == _keys(y)


def test_search_many_empty_and_mixed(engine):
    qs = ["", "   ", "galaxy"]
    out = engine.search_many([Query(q, 10) for q in qs], batch_size=2)
    assert out[0].records == [] and out[1].records == []
    assert out[2].records


def test_search_many_postprocessing_parity():
    """Filters, facets, boosts, and sort must flow through search_many
    identically to search_batch (post-processing runs after the
    pipelined scheduler returns)."""
    import random

    from infidex_tpu import (Boost, BoostStrength, DocumentFields, Field,
                             Filter)

    rng = random.Random(5)
    genres = ["Drama", "SciFi", "Horror"]
    docs = []
    for i in range(600):
        f = DocumentFields()
        f.add_field("title", f"alien {rng.choice(WORDS)} {i}",
                    indexable=True)
        f.add_field("genre", rng.choice(genres), indexable=False,
                    filterable=True)
        f.add_field("year", rng.randint(1980, 2020), indexable=False,
                    filterable=True)
        docs.append(Document(i, f))
    eng = SearchEngine.create_default()
    eng.index_documents(docs)

    def mk():
        out = []
        q1 = Query("alien", 10)
        q1.filter = Filter.parse("genre = 'SciFi'")
        out.append(q1)
        q2 = Query("alien", 10)
        q2.enable_facets = True
        out.append(q2)
        q3 = Query("alien", 10)
        q3.enable_boost = True
        q3.boosts = [Boost(Filter.parse("year > 2000"),
                           BoostStrength.HIGH)]
        out.append(q3)
        q4 = Query("alien", 10)
        q4.sort_by = Field("year")
        q4.sort_ascending = True
        out.append(q4)
        out.append(Query("galaxy", 10))
        out.append(Query("", 10))
        return out

    a = eng.search_batch(mk())
    b = eng.search_many(mk(), batch_size=2, pipeline_depth=3)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert _keys(x) == _keys(y)
        assert x.facets == y.facets


def test_search_many_mixed_param_groups(engine):
    """Queries with different pipeline parameters (coverage_depth) form
    separate sub-batch groups but pipeline through one scheduler call."""
    qs = []
    for i, w in enumerate(["galaxy", "quest", "matrix", "knight",
                           "empire", "alien"]):
        q = Query(w, 10)
        if i % 2:
            q.coverage_depth = 900
        qs.append(q)
    a = engine.search_batch([q.copy() for q in qs])
    b = engine.search_many([q.copy() for q in qs], batch_size=2)
    for x, y in zip(a, b):
        assert _keys(x) == _keys(y)
