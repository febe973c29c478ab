"""Batched facet path == per-result Python oracle (Core/FacetBuilder.cs:19-56).

Round-5 redesign: facet counts run as whole-batch bincounts over ColumnStore
dictionary codes — one device segment-sum (`ops/facets.py`) when the batch
amortizes a dispatch, per-row host bincounts otherwise — instead of the
oracle's per-result Python document walk. These tests pin:

  * host batch path == oracle over scalar+array fields, missing values,
    soft-deleted docs, and key aliases (first-live-doc resolution);
  * device kernel counts == host bincount matrix, including padding rows;
  * engine search vs search_batch facet CONTENT equality (the old test
    only compared None-ness);
  * routing: small batches stay on host, INFIDEX_TPU_DEVICE_FACETS=0/1
    force the route.
"""

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.api.fields import DocumentFields, Weight
from infidex_tpu.core.facets import build_facets
from infidex_tpu.filtering.columnar import ColumnStore
from infidex_tpu.ops.facets import DeviceFacetCounter, facet_counts_batch_host

GENRES = ["Drama", "Crime", "Horror", "SciFi", "Comedy", None, ""]
TAG_SETS = [["cult", "classic"], ["indie"], [], ["classic"], None,
            ["cult", "indie", "80s"]]


def _make_doc(i, title, genre, year, tags):
    f = DocumentFields()
    f.add_field("title", title, Weight.HIGH)
    f.add_field("genre", genre, indexable=False, filterable=True,
                facetable=True)
    f.add_field("year", year, indexable=False, filterable=True,
                facetable=True)
    f.add_field("tags", tags, indexable=False, facetable=True, is_array=True)
    return Document(i, f)


@pytest.fixture(scope="module")
def engine():
    eng = SearchEngine.create_default()
    rng = np.random.RandomState(7)
    docs = []
    for i in range(60):
        docs.append(_make_doc(
            i, f"alien movie {i}", GENRES[int(rng.randint(len(GENRES)))],
            int(1980 + rng.randint(40)),
            TAG_SETS[int(rng.randint(len(TAG_SETS)))]))
    eng.index_documents(docs)
    # soft-delete a few keys, then re-add one key (alias: old deleted doc +
    # new live doc under the same public key — facets must count the live one)
    eng.delete_documents(3)
    eng.delete_documents(11)
    eng.index_documents([_make_doc(5, "alien movie 5 redux", "Western",
                                   2024, ["redux"])])
    return eng


def _oracle(eng, results):
    return build_facets(results, eng.vector_model.documents,
                        eng.document_field_schema)


def test_batch_facets_match_oracle(engine):
    qs = []
    for text in ["alien", "movie", "alien movie 1", "redux", "zzzz"]:
        q = Query(text, 50)
        q.enable_facets = True
        qs.append(q)
    batch = engine.search_batch(qs)
    for q, r in zip(qs, batch):
        # recompute the oracle over exactly the records facets saw:
        # post-processed, pre-truncation == full result set here (max 50)
        expected = _oracle(engine, r.records)
        got = {k: v for k, v in (r.facets or {}).items()}
        assert got == expected, q.search_for_text


def test_single_search_facets_match_oracle(engine):
    q = Query("alien", 50)
    q.enable_facets = True
    r = engine.search(q)
    assert r.facets == _oracle(engine, r.records)
    assert "tags" in r.facets  # array field expanded element-wise
    # count desc, value asc within ties
    for pairs in r.facets.values():
        keyed = [(-c, v) for v, c in pairs]
        assert keyed == sorted(keyed)


def test_search_batch_facet_content_equals_single(engine):
    texts = ["alien", "movie 2", "redux", "alien movie"]
    qs = []
    for t in texts:
        q = Query(t, 20)
        q.enable_facets = True
        qs.append(q)
    singles = [engine.search(q) for q in qs]
    batch = engine.search_batch(qs)
    for s, b in zip(singles, batch):
        assert s.facets == b.facets


def test_device_counter_matches_host_matrix():
    rng = np.random.RandomState(3)
    n_docs, n_values = 500, 37
    codes = rng.randint(-1, n_values, size=n_docs).astype(np.int32)
    id_lists = [rng.choice(n_docs, size=rng.randint(0, 300),
                           replace=False).astype(np.int64)
                for _ in range(9)]
    id_lists[4] = np.zeros(0, np.int64)  # empty result set row
    host = facet_counts_batch_host(codes, n_values, id_lists)
    ctr = DeviceFacetCounter()
    dev = ctr.counts("f", codes, n_values, id_lists)
    np.testing.assert_array_equal(host, dev)
    # cached device table reused on second call
    dev2 = ctr.counts("f", codes, n_values, id_lists[:3])
    np.testing.assert_array_equal(host[:3], dev2)


def test_routing_small_batch_stays_host():
    ctr = DeviceFacetCounter()
    assert not ctr.worth_it(n_values=5, total_ids=10, n_queries=1)
    assert not ctr.worth_it(n_values=5, total_ids=100, n_queries=4)
    assert ctr.worth_it(n_values=5, total_ids=5000, n_queries=4)
    assert not ctr.worth_it(n_values=1, total_ids=5000, n_queries=4)
    assert not ctr.worth_it(n_values=100000, total_ids=5000, n_queries=4)


def test_env_forced_device_facets(engine, monkeypatch):
    monkeypatch.setenv("INFIDEX_TPU_DEVICE_FACETS", "1")
    q = Query("alien", 50)
    q.enable_facets = True
    r_dev = engine.search(q)
    monkeypatch.setenv("INFIDEX_TPU_DEVICE_FACETS", "0")
    r_host = engine.search(q)
    assert r_dev.facets == r_host.facets == _oracle(engine, r_host.records)


def test_facet_pairs_batch_column_store_parity(engine):
    """ColumnStore.facet_pairs_batch == per-query facet_counts."""
    docs = engine.vector_model.documents
    store = ColumnStore(docs)
    rng = np.random.RandomState(11)
    live = [i for i in range(docs.count)
            if not docs.get_document(i).deleted]
    id_lists = [np.asarray(rng.choice(live, size=rng.randint(1, len(live)),
                                      replace=False), np.int64)
                for _ in range(5)]
    for field, is_array in [("genre", False), ("tags", True)]:
        batch = store.facet_pairs_batch(field, id_lists, is_array=is_array)
        for ids, pairs in zip(id_lists, batch):
            assert pairs == store.facet_counts(field, ids,
                                               is_array=is_array)
