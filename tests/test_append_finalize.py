"""Append-only fast finalize (index/append.py) parity vs the slow path.

The fast path (default) must produce search results and index state
bit-identical to INFIDEX_TPU_APPEND_FINALIZE=0, which materializes
per-term lists and re-runs finalize_postings — itself the established
port of the reference's accumulate-then-CalculateWeights cycle
(SearchEngine.cs:165-185, Term.cs:71-122).
"""

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine

BASE = [
    "The Shawshank Redemption",
    "The Godfather",
    "The Dark Knight",
    "Redemption Day",
    "Redemption Road",
    "Star Wars",
    "Star Trek",
    "Batman Begins",
    "Batman Returns",
    "The Batman",
    "Inception",
    "Interstellar",
    "New York Stories",
    "Escape from New York",
    "Speed",
    "Speed 2: Cruise Control",
] * 8  # 128 docs -> per-doc indexing path (bulk needs >= 256)

ADDS = [
    "Streamed doc number one",
    "Zyxwvu brandnewword title",   # brand-new words
    "Star Redemption",             # only existing words
    "batman stream crossover",
    "The Streaming Chronicles",
    "zz",                          # short doc, short word
    "Star Wars: A New Hope",
]

QUERIES = [
    "shawshank", "shaawshank", "redemption shank", "star", "batman",
    "stream", "streamed", "zyxwvu", "brandnewword", "st", "str", "zz",
    "new hope", "dark knight", "speed cruise", "xyzzy",
]


def _build(monkeypatch, fast: bool, adds_per_finalize=3):
    monkeypatch.setenv("INFIDEX_TPU_APPEND_FINALIZE", "1" if fast else "0")
    eng = SearchEngine.create_default()
    eng.index_documents(
        [Document(i, t) for i, t in enumerate(BASE)])
    for j, t in enumerate(ADDS):
        eng.index_document(Document(1000 + j, t))
        if (j + 1) % adds_per_finalize == 0:
            eng.calculate_weights()
    eng.calculate_weights()
    return eng


def _results(eng, text, k=10):
    res = eng.search(Query(text, k))
    return [(r.document_id, round(r.score, 6)) for r in res.records]


@pytest.fixture(scope="module")
def engines():
    mp = pytest.MonkeyPatch()
    try:
        fast = _build(mp, fast=True)
        slow = _build(mp, fast=False)
        yield fast, slow
    finally:
        mp.undo()


class TestResultParity:
    def test_search_results_identical(self, engines):
        fast, slow = engines
        for q in QUERIES:
            assert _results(fast, q) == _results(slow, q), q

    def test_index_state_identical(self, engines):
        fast, slow = engines
        bf, bs = (fast._vector_model.built, slow._vector_model.built)
        assert bf.terms == bs.terms
        assert np.array_equal(bf.df, bs.df)
        assert np.array_equal(bf.term_offsets, bs.term_offsets)
        assert np.array_equal(bf.postings_docs, bs.postings_docs)
        assert np.array_equal(bf.postings_weights, bs.postings_weights)
        assert np.array_equal(bf.doc_lengths, bs.doc_lengths)
        assert bf.avgdl == bs.avgdl

    def test_champion_extension_identical(self, engines):
        fast, slow = engines
        bf, bs = (fast._vector_model.built, slow._vector_model.built)
        bf.ensure_champions()
        bs.ensure_champions()
        assert np.array_equal(bf.champion_starts, bs.champion_starts)
        assert np.array_equal(bf.ext_docs, bs.ext_docs)
        assert np.array_equal(bf.ext_weights, bs.ext_weights)

    def test_word_idf_cache_identical(self, engines):
        fast, slow = engines
        assert (fast._vector_model.word_idf_cache
                == slow._vector_model.word_idf_cache)

    def test_doc_arrays_identical(self, engines):
        fast, slow = engines
        mf, ms = fast._vector_model, slow._vector_model
        assert np.array_equal(mf.deleted_arr, ms.deleted_arr)
        assert np.array_equal(mf.doc_keys_arr, ms.doc_keys_arr)
        assert list(mf.norm_texts) == list(ms.norm_texts)
        assert [(m.first_token, m.token_count) for m in mf.doc_metadata] \
            == [(m.first_token, m.token_count) for m in ms.doc_metadata]

    def test_fast_path_was_taken(self, engines):
        fast, _ = engines
        # the delta machinery must actually have run (guards against the
        # eligibility check silently falling back to the slow path)
        assert fast._vector_model._last_append is not None
        assert fast._vector_model._last_append[1] > 0


class TestChampionsParity:
    def test_short_query_champions(self, engines):
        fast, slow = engines
        for prefix in ("s", "st", "str", "z", "zz", "b", "ba", "the"):
            rf = fast._vector_model.short_query_resolver.resolve(prefix, 10)
            rs = slow._vector_model.short_query_resolver.resolve(prefix, 10)
            assert [(e.document_id, e.score) for e in rf] \
                == [(e.document_id, e.score) for e in rs], prefix


class TestDeleteFallback:
    def test_delete_then_append_finalize(self, monkeypatch):
        monkeypatch.setenv("INFIDEX_TPU_APPEND_FINALIZE", "1")
        eng = SearchEngine.create_default()
        eng.index_documents([Document(i, t) for i, t in enumerate(BASE)])
        eng.index_document(Document(2000, "freshly streamed entry"))
        eng.delete_documents(3)  # Redemption Day
        eng.calculate_weights()
        r = _results(eng, "streamed")
        assert r and r[0][0] == 2000
        assert all(doc_id != 3 for doc_id, _ in _results(eng, "redemption"))

    def test_delete_of_delta_doc(self, monkeypatch):
        monkeypatch.setenv("INFIDEX_TPU_APPEND_FINALIZE", "1")
        eng = SearchEngine.create_default()
        eng.index_documents([Document(i, t) for i, t in enumerate(BASE)])
        eng.index_document(Document(2000, "ephemeral streamed entry"))
        eng.calculate_weights()
        eng.delete_documents(2000)
        assert all(doc_id != 2000 for doc_id, _ in _results(eng, "ephemeral"))


class TestStopTermCrossing:
    def test_stop_term_transition_parity(self, monkeypatch):
        def build(fast):
            monkeypatch.setenv("INFIDEX_TPU_APPEND_FINALIZE",
                               "1" if fast else "0")
            eng = SearchEngine(index_sizes=[3], stop_term_limit=40)
            eng.index_documents(
                [Document(i, f"common{i % 3} filler{i}") for i in range(30)])
            # push "common0"'s grams over the stop limit during the delta
            for j in range(25):
                eng.index_document(Document(100 + j, f"common0 extra{j}"))
            eng.calculate_weights()
            return eng

        fast, slow = build(True), build(False)
        bf, bs = fast._vector_model.built, slow._vector_model.built
        assert np.array_equal(bf.df, bs.df)
        assert (bf.df == -1).any()  # a stop transition actually happened
        assert np.array_equal(bf.postings_docs, bs.postings_docs)
        assert np.array_equal(bf.doc_lengths, bs.doc_lengths)
        for q in ("common0", "filler3", "extra7"):
            assert _results(fast, q) == _results(slow, q), q


class TestChampionMergeUnit:
    """Clipped-term champion parity with a small cap (the engine-level
    tests never exceed DEVICE_TERM_CAP=2048, so the incremental
    re-selection path needs a direct drive)."""

    def _seq(self, rng, n_docs, start=0):
        # (doc_id, weight) stream for one term, weights with heavy ties
        return [(start + i, rng.choice([1, 2, 3, 3, 3, 7, 9]))
                for i in range(n_docs)]

    def test_incremental_selection_matches_full(self):
        import random

        from infidex_tpu.index.append import AppendDelta, fast_merge_built
        from infidex_tpu.index.builder import (TermDictionary,
                                               finalize_postings)

        rng = random.Random(7)
        CAP = 16
        td = TermDictionary()
        base = {"big": self._seq(rng, 300), "mid": self._seq(rng, 40),
                "small": self._seq(rng, 3)}
        for term, seq in base.items():
            tid, _ = td.get_or_add(term)
            p = td.postings[tid]
            for doc, w in seq:
                p.increment_usage(10**6)
                p.first_cycle_add(doc, 10**6, True, w)
        built = finalize_postings(td, 300)
        built.ensure_champions(cap=CAP)

        delta = AppendDelta(start_doc=300, base_terms=len(built.terms))
        adds = {"big": self._seq(rng, 60, 300), "mid": self._seq(rng, 5, 300),
                "fresh": self._seq(rng, 25, 300)}
        for term, seq in adds.items():
            for doc, w in seq:
                st = delta.get_or_add(term, built)
                st.increment_usage(10**6)
                st.first_cycle_add(doc, 10**6, True, w)
        merged = fast_merge_built(built, delta, 360)

        # slow twin: same sequences through the mutable term dict
        for term, seq in adds.items():
            tid, _ = td.get_or_add(term)
            p = td.postings[tid]
            for doc, w in seq:
                p.increment_usage(10**6)
                p.first_cycle_add(doc, 10**6, True, w)
        full = finalize_postings(td, 360)
        full.ensure_champions(cap=CAP)

        assert np.array_equal(merged.term_offsets, full.term_offsets)
        assert np.array_equal(merged.postings_docs, full.postings_docs)
        assert np.array_equal(merged.df, full.df)
        assert np.array_equal(merged.champion_starts, full.champion_starts)
        assert np.array_equal(merged.ext_docs, full.ext_docs)
        assert np.array_equal(merged.ext_weights, full.ext_weights)
        assert (merged.champion_starts >= 0).sum() >= 2  # big+fresh clipped


class TestSigIndexExtension:
    def test_signature_index_extends_and_matches(self, monkeypatch):
        from infidex_tpu.index.vector_model import VectorModel

        monkeypatch.setattr(VectorModel, "SIGNATURE_VOCAB_THRESHOLD", 1)
        monkeypatch.setenv("INFIDEX_TPU_APPEND_FINALIZE", "1")
        eng = SearchEngine.create_default()
        eng.index_documents([Document(i, t) for i, t in enumerate(BASE)])
        m = eng._vector_model
        _results(eng, "shawshenk")          # builds the signature index
        sig_before = m._sig_index
        assert sig_before is not None
        eng.index_document(Document(3000, "Quixotic adventures"))
        eng.calculate_weights()
        assert m._sig_index is sig_before   # extended, not rebuilt
        r_fast = _results(eng, "quixotik")  # typo toward the NEW doc
        assert any(doc_id == 3000 for doc_id, _ in r_fast)
        # oracle: fresh engine over the same final corpus
        eng2 = SearchEngine.create_default()
        eng2.index_documents(
            [Document(i, t) for i, t in enumerate(BASE)]
            + [Document(3000, "Quixotic adventures")])
        assert r_fast == _results(eng2, "quixotik")
