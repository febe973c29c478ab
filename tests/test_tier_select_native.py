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


@pytest.mark.skipif(not native.available, reason="native lib unavailable")
def test_tier_batch_matches_per_query_numpy(monkeypatch):
    """infidex_tier_batch (whole-batch select+filter+score+topk in one
    native call) must be bit-identical to the per-query NUMPY path:
    same routing (union/typo-suspect -> None), same pools after the
    deleted filter, same f32 BM25 scores, same (score desc, id asc)
    top-k — including zero-padding of short pools."""
    import infidex_tpu.index.candidates as cand_mod
    import infidex_tpu.native as nat
    from infidex_tpu.index.candidates import TieredStage1

    monkeypatch.setattr(cand_mod, "TIER_LANE_BUDGET", 1)
    rng = np.random.default_rng(123)
    for trial in range(12):
        built = _random_built(rng)
        n_docs = 5000
        # one RARE term (df < 10) to exercise the typo-suspect union route
        rare_docs = np.unique(
            rng.integers(0, n_docs, size=5)).astype(np.int32)
        built.postings_docs = np.concatenate([built.postings_docs,
                                              rare_docs])
        built.postings_weights = np.concatenate(
            [built.postings_weights,
             rng.integers(1, 20, size=rare_docs.size).astype(np.uint8)])
        built.term_offsets = np.concatenate(
            [built.term_offsets,
             [built.term_offsets[-1] + rare_docs.size]])
        built.df = np.concatenate([built.df,
                                   np.asarray([rare_docs.size], np.int32)])
        built.doc_lengths = rng.uniform(
            1.0, 30.0, size=n_docs).astype(np.float32)
        built.avgdl = float(built.doc_lengths.mean())
        built.gen = 1000 + trial
        built.champion_starts = None   # term_device_range: full CSR
        n_terms = len(built.df)

        deleted = None
        if trial % 2:
            deleted = np.zeros(n_docs, bool)
            deleted[rng.choice(n_docs, size=500, replace=False)] = True

        preps = []
        for _ in range(6):
            k = int(rng.integers(2, 5))
            tids = rng.choice(n_terms, size=k, replace=False).tolist()
            idfs = rng.uniform(0.1, 5.0, size=k).tolist()
            fuzzy = [] if rng.random() < 0.9 else [[0]]
            preps.append((tids, idfs, fuzzy))
        top_k = int(rng.integers(5, 60))

        ts = TieredStage1(built, deleted)
        batch_out = ts.run_batch(preps, top_k)

        old = nat.available
        try:
            nat.available = False
            ref = [ts.run(t, i, top_k) if ts.applicable(t, f) else None
                   for t, i, f in preps]
        finally:
            nat.available = old

        for qi, (b, r) in enumerate(zip(batch_out, ref)):
            if r is None or b is None:
                assert (b is None) == (r is None), (trial, qi)
                continue
            np.testing.assert_array_equal(b[0], r[0], err_msg=f"{trial}/{qi}")
            np.testing.assert_array_equal(b[1], r[1], err_msg=f"{trial}/{qi}")
            np.testing.assert_array_equal(b[2], r[2], err_msg=f"{trial}/{qi}")
