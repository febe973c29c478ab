"""Incremental indexing, deletes, and thread-safety hammering
(reference: ThreadSafetyTests.cs — concurrent searches, search-during-index,
zero exceptions)."""

import threading

import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.index.incremental import (DeltaIndex, IndexMerger,
                                           TombstoneTracker)

TITLES = ["The Shawshank Redemption", "The Godfather", "Star Wars",
          "Star Trek", "Batman Begins", "Inception", "Interstellar"]


def build_engine():
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(TITLES)])
    return eng


class TestIncremental:
    def test_delta_accumulates_and_merges(self):
        eng = build_engine()
        merger = IndexMerger(eng, DeltaIndex(auto_merge_threshold=100))
        merger.add(Document(100, "Blade Runner"))
        merger.add(Document(101, "Blade Runner 2049"))
        assert merger.delta.pending_count == 2
        merged = merger.merge()
        assert merged == 2
        result = eng.search(Query("blade runner", 5))
        keys = {r.document_id for r in result.records}
        assert 100 in keys and 101 in keys

    def test_auto_merge_threshold(self):
        eng = build_engine()
        merger = IndexMerger(eng, DeltaIndex(auto_merge_threshold=3))
        for i in range(3):
            merger.add(Document(200 + i, f"auto doc {i} zeta"))
        # threshold hit -> merged automatically
        assert merger.delta.pending_count == 0
        assert eng.search(Query("zeta", 5)).records

    def test_tombstones_delete(self):
        eng = build_engine()
        merger = IndexMerger(eng)
        merger.delete(0)  # The Shawshank Redemption
        merger.merge()
        result = eng.search(Query("shawshank", 5))
        assert all(r.document_id != 0 for r in result.records)

    def test_tombstone_tracker(self):
        t = TombstoneTracker()
        t.add(5)
        assert t.is_deleted(5) and t.count == 1
        t.remove(5)
        assert not t.is_deleted(5)

    def test_delete_then_readd(self):
        eng = build_engine()
        merger = IndexMerger(eng)
        merger.delete(0)
        merger.add(Document(0, "The Shawshank Redemption Returns"))
        merger.merge()
        result = eng.search(Query("shawshank returns", 5))
        assert result.records
        doc = eng.get_document(result.records[0].document_id)
        assert "Returns" in doc.indexed_text


class TestThreadSafety:
    def test_concurrent_searches(self):
        eng = build_engine()
        errors = []

        def hammer():
            try:
                for q in ["shawshank", "star", "batman", "teh godfather"]:
                    eng.search(Query(q, 5))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=hammer) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors

    def test_search_during_index(self):
        eng = build_engine()
        errors = []
        stop = threading.Event()

        def searcher():
            try:
                while not stop.is_set():
                    eng.search(Query("star", 5))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        def indexer():
            try:
                for i in range(10):
                    eng.index_document(Document(300 + i, f"new doc {i}"))
                eng.calculate_weights()
            except Exception as e:  # pragma: no cover
                errors.append(e)
            finally:
                stop.set()

        ts = [threading.Thread(target=searcher) for _ in range(4)]
        ti = threading.Thread(target=indexer)
        for t in ts:
            t.start()
        ti.start()
        ti.join()
        for t in ts:
            t.join(timeout=30)
        assert not errors

    def test_concurrent_save_load(self, tmp_path):
        eng = build_engine()
        errors = []

        def saver(i):
            try:
                eng.save(str(tmp_path / f"idx{i}.bin"))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        def searcher():
            try:
                for _ in range(5):
                    eng.search(Query("inception", 3))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=saver, args=(i,)) for i in range(2)]
        threads += [threading.Thread(target=searcher) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors


def test_search_serves_during_unfinalized_add():
    """A live engine must keep serving the last finalized image between
    an incremental add and the next calculate_weights (the reference's
    accumulate-then-CalculateWeights cycle never goes dark)."""
    from infidex_tpu import Document, Query, SearchEngine

    eng = SearchEngine.create_default()
    eng.index_documents([Document(0, "The Shawshank Redemption"),
                         Document(1, "Redemption Day")])
    before = eng.search(Query("redemption", 5))
    assert before.records
    eng.index_document(Document(2, "Fresh Unfinalized Doc"))
    during = eng.search(Query("redemption", 5))  # add not yet finalized
    assert [r.document_id for r in during.records] == \
        [r.document_id for r in before.records]
    batch = eng.search_batch([Query("redemption", 5)])
    assert batch[0].records
    eng.calculate_weights()
    after = eng.search(Query("unfinalized", 5))
    assert any(r.document_id == 2 for r in after.records)


def test_fuzzy_matches_terms_added_incrementally():
    """The incrementally-extended LD1 dictionary must cover terms that
    entered the vocabulary AFTER the initial build."""
    from infidex_tpu import Document, Query, SearchEngine

    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(
        ["alpha beta", "gamma delta", "epsilon zeta"])])
    assert eng.search(Query("quixotic", 5)).records == []
    eng.index_document(Document(7, "quixotic venture"))
    eng.calculate_weights()
    exact = eng.search(Query("quixotic", 5))
    assert any(r.document_id == 7 for r in exact.records)
    fuzzy = eng.search(Query("quixtoic", 5))  # transposition typo
    assert any(r.document_id == 7 for r in fuzzy.records)
