"""Engine-level parity: device coverage path == host coverage path."""

import random

import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.scoring import pipeline as pl

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "redemption",
         "shawshank", "star", "wars", "trek", "batman", "the", "new", "york"]


def build_engine(n=120, seed=5):
    rng = random.Random(seed)
    eng = SearchEngine.create_default()
    docs = []
    for i in range(n):
        k = rng.randint(1, 5)
        docs.append(Document(i, " ".join(rng.choice(WORDS) for _ in range(k))))
    docs.append(Document(n, "The Shawshank Redemption"))
    eng.index_documents(docs)
    return eng


QUERIES = ["shawshank", "shawshenk", "redemption sh", "alpha bravo",
           "batman the", "star w", "charlie delta echo", "teh star",
           "new york", "redemption a"]


@pytest.mark.parametrize("query", QUERIES)
def test_device_path_matches_host_path(query, monkeypatch):
    eng = build_engine()

    monkeypatch.setattr(pl, "DEVICE_COVERAGE_MIN_CANDIDATES", 10**9)
    host = eng.search(Query(query, 20))
    host_ranking = [(r.document_id, round(r.score, 4), r.tiebreaker)
                    for r in host.records]

    monkeypatch.setattr(pl, "DEVICE_COVERAGE_MIN_CANDIDATES", 1)
    dev = eng.search(Query(query, 20))
    dev_ranking = [(r.document_id, round(r.score, 4), r.tiebreaker)
                   for r in dev.records]

    assert dev_ranking == host_ranking
