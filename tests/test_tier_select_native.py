"""Native tier-select (infidex_tier_select) parity vs the numpy
TieredCandidateSelector.select — identical pools, labels, and champion
tie-handling on randomized CSR indexes."""

import numpy as np
import pytest

from infidex_tpu import native
from infidex_tpu.index.candidates import (TieredCandidateSelector,
                                          top_weight_idx)


class _FakeBuilt:
    def __init__(self, term_offsets, docs, weights, df):
        self.term_offsets = term_offsets
        self.postings_docs = docs
        self.postings_weights = weights
        self.df = df


def _random_built(rng, n_terms=12, n_docs=5000):
    parts_d, parts_w, offsets = [], [], [0]
    for _ in range(n_terms):
        df = int(rng.integers(16, 2000))  # >= TYPO_SUSPECT_DF: tier path
        docs = np.unique(rng.integers(0, n_docs, size=df)).astype(np.int32)
        w = rng.integers(1, 20, size=docs.size).astype(np.uint8)  # many ties
        parts_d.append(docs)
        parts_w.append(w)
        offsets.append(offsets[-1] + docs.size)
    built = _FakeBuilt(
        np.asarray(offsets, np.int64),
        np.concatenate(parts_d),
        np.concatenate(parts_w),
        np.asarray([p.size for p in parts_d], np.int32))
    return built


def test_top_weight_idx_rule():
    w = np.array([5, 9, 9, 1, 9, 5, 9], np.uint8)
    # cap 3: weight-9 entries at positions 1,2,4,6 -> first three win
    np.testing.assert_array_equal(top_weight_idx(w, 3), [1, 2, 4])
    # cap 5: all four 9s + first 5 (position 0)
    np.testing.assert_array_equal(top_weight_idx(w, 5), [0, 1, 2, 4, 6])
    # cap >= n: everything
    np.testing.assert_array_equal(top_weight_idx(w, 7), np.arange(7))


@pytest.mark.skipif(not native.available, reason="native lib unavailable")
def test_native_select_matches_numpy():
    rng = np.random.default_rng(42)
    for trial in range(25):
        built = _random_built(rng)
        sel = TieredCandidateSelector(built)
        n_terms = len(built.df)
        k = int(rng.integers(2, min(5, n_terms + 1)))
        term_ids = rng.choice(n_terms, size=k, replace=False).tolist()
        idfs = rng.uniform(0.1, 5.0, size=k).tolist()
        top_k = int(rng.integers(5, 80))

        native_pool, native_label = sel.select(term_ids, idfs, top_k,
                                               want_union=False)
        # force the numpy path by hiding the native module
        import infidex_tpu.index.candidates as cand_mod
        import infidex_tpu.native as nat
        old = nat.available
        try:
            nat.available = False
            np_pool, np_label = sel.select(term_ids, idfs, top_k,
                                           want_union=False)
        finally:
            nat.available = old
        assert native_label == np_label, trial
        np.testing.assert_array_equal(native_pool, np_pool), trial


@pytest.mark.skipif(not native.available, reason="native lib unavailable")
def test_champion_memo_generation_invalidation():
    """The native champion memo (keyed by (tid, cap), invalidated by the
    generation token) must never serve champions from a previous build:
    two indexes with identical term ids / caps but different postings,
    queried with distinct generations, must each match their own numpy
    twin."""
    rng = np.random.default_rng(7)
    for gen in (101, 102):   # distinct fake build tokens
        built = _random_built(rng)
        sel = TieredCandidateSelector(built)
        built.gen = gen      # picked up via getattr(built, "gen", 0)
        term_ids = [0, 1, 2]
        idfs = [2.0, 1.5, 1.0]
        for top_k in (5, 20):   # repeat caps across generations
            native_pool, native_label = sel.select(
                term_ids, idfs, top_k, want_union=False)
            # same call twice: second hits the memo, must be identical
            again_pool, again_label = sel.select(
                term_ids, idfs, top_k, want_union=False)
            np.testing.assert_array_equal(native_pool, again_pool)
            assert native_label == again_label
            import infidex_tpu.native as nat
            old = nat.available
            try:
                nat.available = False
                np_pool, np_label = sel.select(term_ids, idfs, top_k,
                                               want_union=False)
            finally:
                nat.available = old
            assert native_label == np_label
            np.testing.assert_array_equal(native_pool, np_pool)
