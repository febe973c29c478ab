"""Full SearchEngine parity: sharded serving == single-device serving.

enable_sharded_serving shards Stage-1 scoring and the coverage kernel over
the 8-CPU virtual mesh (conftest); every query class the facade supports
must return identical records either way — the mesh analogue of the
reference's per-segment search + heap merge (VectorModel.cs:573-585)."""

import numpy as np
import pytest

from infidex_tpu.core.documents import Document
from infidex_tpu.engine import SearchEngine
from infidex_tpu.api.query import Query

TITLES = [
    "The Shawshank Redemption", "The Godfather", "The Dark Knight",
    "Pulp Fiction", "Schindler's List", "Forrest Gump", "Fight Club",
    "Inception", "The Matrix", "Goodfellas", "Interstellar", "Seven",
    "The Silence of the Lambs", "Saving Private Ryan", "The Green Mile",
    "Terminator 2: Judgment Day", "Back to the Future", "Alien", "Aliens",
    "Gladiator", "The Departed", "The Prestige", "Memento", "The Pianist",
    "Zelená škola", "Dark Waters", "Dark City", "City of God",
    "The Lion King", "Beauty and the Beast", "Toy Story", "Finding Nemo",
]

QUERIES = [
    "shawshank",               # exact word
    "shawshenk",               # typo (fuzzy group -> sharded psum df)
    "redemption sh",           # multi-term partial
    "dark",                    # common word, many hits
    "the",                     # stoppy word
    "toy story",               # exact multi-word
    "intersteller",            # typo
    "za",                      # short query
    "x",                       # 1-char
    "zelena skola",            # diacritics
]


def _snapshot(engine, queries):
    out = []
    for q in queries:
        r = engine.search(Query(q, 10))
        out.append([(e.document_id, round(float(e.score), 4), e.tiebreaker)
                    for e in r.records])
    return out


@pytest.fixture(scope="module")
def engines():
    single = SearchEngine.create_default()
    single.index_documents([Document(i, t) for i, t in enumerate(TITLES)])

    sharded = SearchEngine.create_default()
    sharded.index_documents([Document(i, t) for i, t in enumerate(TITLES)])
    sharded.enable_sharded_serving(n_devices=8)
    return single, sharded


def test_search_parity_all_query_classes(engines):
    single, sharded = engines
    assert sharded.vector_model.sharded is not None
    a = _snapshot(single, QUERIES)
    b = _snapshot(sharded, QUERIES)
    for q, ra, rb in zip(QUERIES, a, b):
        assert ra == rb, q


def test_search_batch_parity(engines):
    single, sharded = engines
    ra = single.search_batch([Query(q, 10) for q in QUERIES])
    rb = sharded.search_batch([Query(q, 10) for q in QUERIES])
    for q, x, y in zip(QUERIES, ra, rb):
        assert [(e.document_id, round(float(e.score), 4)) for e in x.records] \
            == [(e.document_id, round(float(e.score), 4)) for e in y.records], q


def test_sharded_delete_documents(engines):
    _, sharded = engines
    r = sharded.search(Query("gladiator", 5))
    assert r.records
    key = r.records[0].document_id
    sharded.delete_documents(key)
    try:
        r2 = sharded.search(Query("gladiator", 5))
        assert all(e.document_id != key for e in r2.records)
    finally:
        # restore for other tests (module-scoped fixture)
        doc = sharded.vector_model.documents.get_document_by_public_key(key)
        for d in sharded.vector_model.documents.get_documents_for_public_key(key):
            d.deleted = False
            sharded.vector_model.documents.count += 1
        n = len(sharded.vector_model.documents)
        deleted = np.zeros(n, bool)
        sharded.vector_model.sharded.set_deleted(deleted)
        sharded.vector_model.device.set_deleted(deleted)
        sharded.vector_model.deleted_arr = deleted


def test_reindex_keeps_sharding(engines):
    _, sharded = engines
    sharded.index_documents([Document(1000 + i, t)
                             for i, t in enumerate(["Blade Runner",
                                                    "Blade Runner 2049"])])
    assert sharded.vector_model.sharded is not None
    r = sharded.search(Query("blade runner", 5))
    assert r.records and r.records[0].document_id in (1000, 1001)
