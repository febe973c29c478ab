"""Auxiliary component tests: packed LCS, autocomplete scoring, Jaccard,
ProcessMonitor, TokenCache, fuzzy autocomplete DFS."""

import threading
import time

import pytest

from infidex_tpu.api.process_monitor import (OperationCancelledError,
                                             ProcessMonitor)
from infidex_tpu.index.fuzzy_autocomplete import DepthFirstFuzzySearch
from infidex_tpu.tokenization.token_cache import TokenCache
from infidex_tpu.utils.metrics import longest_common_subsequence
from infidex_tpu.utils.metrics_extra import (JaccardMetric,
                                             compute_jaro_like_score,
                                             compute_lcs_length, packed_lcs)


class TestPackedLcs:
    def test_single_word_matches_dp(self):
        for a, b in [("abc", "abc"), ("abcde", "ace"), ("kitten", "sitting"),
                     ("xyz", "abc"), ("batman", "battamam")]:
            assert compute_lcs_length(a, b) == longest_common_subsequence(a, b)

    def test_packed_multi_word(self):
        result = packed_lcs(["new", "york"], "newyork city")
        assert result.lcs_values == [3, 4]
        assert result.total_lcs == 7
        assert result.matched_words == 2

    def test_packed_equals_individual(self):
        words = ["star", "wars", "trek"]
        doc = "star trek into darkness"
        packed = packed_lcs(words, doc)
        individual = [longest_common_subsequence(w, doc) for w in words]
        assert packed.lcs_values == individual

    def test_no_match(self):
        result = packed_lcs(["zzz"], "abc")
        assert result.total_lcs == 0
        assert result.matched_words == 0


class TestAutocompleteScoring:
    def test_exact_match_is_high(self):
        assert compute_jaro_like_score("star", "star") > \
            compute_jaro_like_score("star", "stellar")

    def test_prefix_preferred(self):
        assert compute_jaro_like_score("sta", "star") > \
            compute_jaro_like_score("sta", "least")

    def test_empty(self):
        assert compute_jaro_like_score("", "x") == 0.0


class TestJaccard:
    def test_set_jaccard(self):
        j = JaccardMetric()
        assert j.jaccard_of_char_set("abc", "abc") == 1.0
        assert j.jaccard_of_char_set("abc", "xyz") == 0.0
        assert j.jaccard_of_char_set("ab", "bc") == pytest.approx(1 / 3)

    def test_multiset_jaccard(self):
        j = JaccardMetric()
        assert j.jaccard_of_all_chars("aab", "ab") == pytest.approx(2 / 3)


class TestProcessMonitor:
    def test_progress_events(self):
        m = ProcessMonitor()
        m.start()
        seen = []
        m.progress_changed.append(seen.append)
        m.report_progress(10)
        m.report_progress(10)  # duplicate suppressed
        m.report_progress(100)
        assert seen == [10, 100]
        assert m.is_completed

    def test_cancellation(self):
        m = ProcessMonitor()
        m.start()
        m.cancel()
        with pytest.raises(OperationCancelledError):
            m.throw_if_cancelled()

    def test_timeout(self):
        m = ProcessMonitor(timeout_seconds=0.0)
        m.start()
        time.sleep(0.01)
        assert m.timed_out
        with pytest.raises(TimeoutError):
            m.throw_if_cancelled()

    def test_wait_for_completion(self):
        m = ProcessMonitor()
        m.start()
        t = threading.Timer(0.05, m.complete)
        t.start()
        assert m.wait_for_completion(timeout=2.0)


class TestTokenCache:
    def test_lru_eviction(self):
        c = TokenCache(capacity=2)
        c.put("a", [1])
        c.put("b", [2])
        c.get("a")
        c.put("c", [3])  # evicts "b"
        assert c.get("b") is None
        assert c.get("a") == [1]

    def test_get_or_compute(self):
        c = TokenCache()
        calls = []

        def compute(t):
            calls.append(t)
            return list(t)

        assert c.get_or_compute("xy", compute) == ["x", "y"]
        assert c.get_or_compute("xy", compute) == ["x", "y"]
        assert calls == ["xy"]
        assert c.hit_rate > 0


class TestFuzzyAutocomplete:
    def test_exact_first(self):
        dfs = DepthFirstFuzzySearch()
        for w in ["star", "stark", "start", "stellar", "moon"]:
            dfs.add(w)
        results = dfs.search("star", k=3)
        assert results[0][0] == "star"
        assert results[0][2] == 0

    def test_fuzzy_prefix(self):
        dfs = DepthFirstFuzzySearch()
        for w in ["algorithm", "alligator", "zebra"]:
            dfs.add(w)
        results = dfs.search("algro", k=2, max_distance=2)
        names = [r[0] for r in results]
        assert "algorithm" in names

    def test_k_limit(self):
        dfs = DepthFirstFuzzySearch()
        for i in range(50):
            dfs.add(f"term{i}")
        assert len(dfs.search("term", k=5)) == 5


class TestObservability:
    """Aux subsystems (SURVEY §5): execution time, cancellation, explain."""

    def _engine(self):
        from infidex_tpu import Document, SearchEngine
        eng = SearchEngine.create_default()
        eng.index_documents([Document(0, "The Shawshank Redemption"),
                             Document(1, "Star Wars")])
        return eng

    def test_execution_time_recorded(self):
        from infidex_tpu import Query
        eng = self._engine()
        r = eng.search(Query("shawshank", 5))
        assert r.execution_time_ms >= 0 and r.records

    def test_cancellation_via_monitor(self):
        import pytest
        from infidex_tpu import Document
        from infidex_tpu.api.process_monitor import ProcessMonitor
        eng = self._engine()
        mon = ProcessMonitor()
        mon.start()
        mon.cancel()
        with pytest.raises(InterruptedError):
            eng.index_documents([Document(2, "x")], monitor=mon)

    def test_explain(self):
        eng = self._engine()
        e = eng.explain("shawshenk", 0)
        assert e["word_hits"] >= 1 and e["is_complete"]
        assert e["score"] > 0 and "precedence" in e and "semantic" in e
        assert eng.explain("shawshenk", 999) == {}

    def test_progress_events(self):
        from infidex_tpu import Document, SearchEngine
        eng = SearchEngine.create_default()
        seen = []
        eng.index_documents([Document(i, f"doc {i}") for i in range(10)],
                            progress=lambda p: seen.append(p))
        assert seen and seen[-1] == 100

    def test_async_wrappers(self):
        from infidex_tpu import Document, Query, SearchEngine
        eng = SearchEngine.create_default()
        fut = eng.index_documents_async([Document(0, "async doc alpha")])
        fut.result(timeout=60)
        r = eng.search_async(Query("alpha", 5)).result(timeout=60)
        assert r.records

    def test_legacy_ranked_score(self):
        """CalculateRankedScore bit layout (CoverageScorer.cs:200-251)."""
        from infidex_tpu.coverage.engine import (CoverageFeatures,
                                                 calculate_ranked_score)
        f = CoverageFeatures()
        f.terms_count = 2
        f.terms_with_any_match = 2
        f.terms_fully_matched = 2
        f.terms_strict_matched = 2
        f.terms_prefix_matched = 2
        f.first_match_index = 0
        f.sum_ci = 2.0
        f.word_hits = 2
        f.coverage_score = 255
        packed = calculate_ranked_score(f, doc_token_count=2,
                                        base_tfidf_score=0)
        prec, base = packed >> 8, packed & 0xFF
        # all-found|fully|perfect|strict|first|prefix = 128+64+32+16+8+4
        assert prec == 252, prec
        assert base == (63 << 2 | 3)
        # single-term swaps strict/perfect bit positions
        f.terms_count = 1
        f.terms_with_any_match = 1
        f.terms_fully_matched = 1
        f.terms_strict_matched = 1
        f.terms_prefix_matched = 1
        f.sum_ci = 1.0
        f.word_hits = 2
        packed1 = calculate_ranked_score(f, 2, 0)
        assert (packed1 >> 8) & 32  # strict-whole in bit 5 for single term


def test_coverage_fallback_counters():
    """The pipeline counts device-scored vs host-fallback coverage
    candidates (shape-cap overflows were a silent cliff)."""
    from infidex_tpu import Document, Query, SearchEngine

    eng = SearchEngine.create_default()
    docs = [Document(i, f"alpha bravo charlie delta word{i % 40}")
            for i in range(120)]
    # one pathological doc beyond the kernel's D_MAX token cap
    docs.append(Document(999, " ".join(f"tok{j}" for j in range(200))))
    eng.index_documents(docs)
    eng.search_batch([Query("alpha bravo", 10), Query("tok3 tok5", 10)])
    pipe = eng._pipeline
    assert pipe.coverage_device_count > 0
    assert pipe.coverage_host_fallback_count >= 1  # the 200-token doc
