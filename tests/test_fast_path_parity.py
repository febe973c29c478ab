"""Vectorized (array) batch pipeline == entry-based pipeline == sequential.

The fast path (_fast_path_ok) replaces per-candidate Python with numpy over
the whole worklist; these tests force the slow path on the same corpus and
assert bit-identical results, including at coverage_depth-truncating corpus
sizes where the top-500 tail membership matters.
"""

import random

import pytest

from infidex_tpu import Document, Query, SearchEngine

ADJ = ["dark", "silent", "broken", "golden", "hidden", "lost", "final",
       "iron", "crimson", "frozen", "burning", "endless", "savage", "wild"]
NOUN = ["knight", "redemption", "empire", "shadow", "river", "mountain",
        "storm", "garden", "promise", "journey", "kingdom", "harbor",
        "winter", "crown", "station", "shawshank", "galaxy", "horizon"]

QUERIES = [
    "shawshank", "shaawshank", "redemption shank", "dark knigt",
    "golden riv", "storm", "frozen harbr", "the", "a", "kingdom crown",
    "endless wintr", "galxy", "hidden promise", "st", "zzz",
]


def _corpus(n):
    rng = random.Random(7)
    titles = []
    for i in range(n):
        k = rng.randint(2, 4)
        words = [rng.choice(ADJ) if j % 2 == 0 else rng.choice(NOUN)
                 for j in range(k)]
        titles.append(" ".join(words).title())
    titles[0] = "The Shawshank Redemption"
    return titles


def _records(result):
    return [(r.document_id, round(r.score, 4), r.tiebreaker)
            for r in result.records]


@pytest.fixture(scope="module", params=[120, 900])
def engine(request):
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t)
                         for i, t in enumerate(_corpus(request.param))])
    return eng


def test_fast_equals_slow_batch(engine):
    docs = engine._vector_model.documents
    assert not docs.multi_segment
    queries = [Query(q, 10) for q in QUERIES]
    fast = engine.search_batch(queries)

    # Forcing multi_segment=True routes execute_batch through the
    # entry-based (slow) pipeline; the corpus itself is unchanged.
    docs.multi_segment = True
    try:
        slow = engine.search_batch([Query(q, 10) for q in QUERIES])
    finally:
        docs.multi_segment = False

    for q, f, s in zip(QUERIES, fast, slow):
        assert _records(f) == _records(s), q


def test_fast_equals_sequential(engine):
    singles = [engine.search(Query(q, 10)) for q in QUERIES]
    batch = engine.search_batch([Query(q, 10) for q in QUERIES])
    for q, s, b in zip(QUERIES, singles, batch):
        assert _records(s) == _records(b), q
