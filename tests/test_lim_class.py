"""Low-id-matcher class semantics + Damerau-LD1 fuzzy expansion.

Covers the round-3 candidate generators:
  - ``_lim_rows``: lowest True positions of a mask (vs a numpy oracle)
  - ``ensure_champions``: clipped terms keep their LIM_K lowest doc ids
  - ``_fuzzy_verify``: Damerau-LD1 accepts adjacent transpositions,
    rejects distance-2 edits; the knob restores reference LD1 semantics
  - end-to-end: a transposition typo of a word LONGER than the
    WordMatcher LD1 gate still finds its documents (the fuzzy-expansion
    path; reference FstIndex.MatchWithinEditDistance1 is plain LD1 and
    misses these by design)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.index.device import LIM_K, _lim_rows
from infidex_tpu.index.vector_model import VectorModel


def test_lim_rows_lowest_true_positions():
    rng = np.random.default_rng(7)
    for _ in range(4):
        m = rng.random((3, 4000)) > 0.99
        out = np.asarray(_lim_rows(jnp.asarray(m), 300)).astype(np.int64)
        for b in range(m.shape[0]):
            pos = np.flatnonzero(m[b])[: min(LIM_K, 300)]
            want = np.full(min(LIM_K, 300), 1 << 24, np.int64)
            want[: pos.size] = pos
            assert (out[b][: want.size] == want).all()


def test_champions_reserve_lowest_ids():
    from infidex_tpu.index.builder import TermDictionary, finalize_postings
    from infidex_tpu.index.device import term_device_range

    td = TermDictionary()
    n_docs = 600
    rng = np.random.default_rng(3)
    tid, _ = td.get_or_add("huge")
    # one huge term present in every doc with random weights
    for d in range(n_docs):
        td.postings[tid].increment_usage(10**6)
        td.postings[tid].first_cycle_add(d, 10**6, False,
                                         float(rng.integers(1, 200)))
    built = finalize_postings(td, n_docs)
    built.ensure_champions(cap=64)
    s, n = term_device_range(built, tid)
    lanes = np.asarray(built.ext_docs[s:s + n])
    k_low = min(LIM_K, 64 // 2)
    # the k_low lowest doc ids must all be present in the champion lanes
    assert set(range(k_low)) <= set(lanes.tolist())
    assert n == 64


def test_fuzzy_verify_damerau():
    m = VectorModel.__new__(VectorModel)
    m.fuzzy_transpositions = True
    assert m._fuzzy_verify("gidled", "gilded")          # transposition
    assert m._fuzzy_verify("gilde", "gilded")           # LD1 delete
    assert m._fuzzy_verify("gilded", "gilded")          # equal
    assert not m._fuzzy_verify("gidled", "golden")      # far
    assert not m._fuzzy_verify("ab", "ba" + "xx")       # len gate
    # two swaps = Damerau distance 2 -> rejected
    assert not m._fuzzy_verify("badc", "abcd")
    m.fuzzy_transpositions = False                      # reference LD1
    assert not m._fuzzy_verify("gidled", "gilded")
    assert m._fuzzy_verify("gilde", "gilded")


def test_long_word_transposition_end_to_end():
    # 'wonderfulness' (13 chars) exceeds maximum_word_size_ld1=8: the
    # WordMatcher cannot rescue its transposition typo; the Damerau
    # fuzzy expansion must.
    docs = [Document(0, "The Wonderfulness Chronicle"),
            Document(1, "A Separate Story"),
            Document(2, "Wonderfulness Again")]
    eng = SearchEngine.create_default()
    eng.index_documents(docs)
    r = eng.search(Query("wondrefulness", 5))           # 'er' -> 're'
    got = {e.document_id for e in r.records}
    assert 0 in got and 2 in got, got


def test_transpositions_knob_restores_reference_ld1():
    docs = [Document(0, "The Wonderfulness Chronicle"),
            Document(1, "A Separate Story")]
    eng = SearchEngine.create_default()
    eng.index_documents(docs)
    model = eng.vector_model
    old = VectorModel.fuzzy_transpositions
    try:
        model.fuzzy_transpositions = False
        model._fuzzy_cache.clear() if hasattr(
            model._fuzzy_cache, "clear") else None
        ids = model.expand_missing_term_ids("wondrefulness")
        terms = [model.built.terms[int(t)] for t in ids]
        assert "wonderfulness" not in terms
        model.fuzzy_transpositions = True
        model._fuzzy_cache.put("wondrefulness", None) if False else None
        # fresh token to bypass the LRU
        ids2 = model.expand_missing_term_ids("wonderfulnses")
        terms2 = [model.built.terms[int(t)] for t in ids2]
        assert "wonderfulness" in terms2
    finally:
        VectorModel.fuzzy_transpositions = old


def test_native_score_pool_parity():
    # native C twin must be bit-identical to the numpy formulation
    from infidex_tpu import native as nat
    if not nat.available:
        pytest.skip("native lib unavailable")
    import bench
    from infidex_tpu.index.device import B, DELTA, K1

    titles = bench.make_corpus(5000)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    built = eng.vector_model.built
    rng = np.random.default_rng(11)
    avgdl = np.float32(max(built.avgdl, 1e-9))
    for _ in range(20):
        tids = rng.integers(0, len(built.terms),
                            size=rng.integers(1, 10)).tolist()
        idfs = [float(np.float32(rng.random() * 8)) for _ in tids]
        pool = np.unique(rng.integers(
            0, 5000, size=rng.integers(5, 600))).astype(np.int64)
        a = nat.score_pool_native(
            built.term_offsets, built.postings_docs,
            built.postings_weights, built.doc_lengths, avgdl, tids, idfs,
            pool)
        dl = built.doc_lengths[pool].astype(np.float32)
        dl = np.where(dl <= 0.0, np.float32(1.0), dl)
        norm = np.float32(K1) * (np.float32(1.0 - B)
                                 + np.float32(B) * (dl / avgdl))
        b = np.zeros(pool.size, np.float32)
        for tid, idf in zip(tids, idfs):
            s, e = int(built.term_offsets[tid]), int(
                built.term_offsets[tid + 1])
            p = built.postings_docs[s:e]
            if p.size == 0:
                continue
            pos = np.searchsorted(p, pool)
            pos_c = np.minimum(pos, p.size - 1)
            found = p[pos_c] == pool
            tf = np.where(found, built.postings_weights[s + pos_c],
                          0).astype(np.float32)
            contrib = np.float32(idf) * (
                (tf * np.float32(K1 + 1.0)) / (tf + norm)
                + np.float32(DELTA))
            b += np.where(found, contrib, np.float32(0.0))
        assert np.array_equal(a, b)


def test_depth_nested_candidates_on_tie_heavy_corpus():
    """Production (depth-500) coverage candidates must be a subset of a
    deeper run's (depth-2000) on a corpus where one query's Stage-1 tie
    class dwarfs both depths — the stable_top_k contract end-to-end
    (plain lax.top_k sampled DIFFERENT tie members per depth)."""
    import random

    rng = random.Random(5)
    syll = ["ba", "ce", "do", "fa", "gi", "ha", "ji", "ka", "lo", "me"]
    docs = [Document(i, f"Yorin{rng.choice(syll)} "
                        f"{rng.choice(syll).title()}zen")
            for i in range(3000)]
    eng = SearchEngine.create_default()
    eng.index_documents(docs)
    pipe = eng._pipeline
    model = eng.vector_model

    def worklist(depth):
        prep = model.prepare_stage1("yorin")
        out = model.stage1_tiered_maybe(prep, depth)
        if out is None:
            out = model.stage1_backend.search_batch(
                [prep], depth, total_docs=model.documents.count,
                stop_term_limit=model.stop_term_limit)[0]
        s1 = model.finish_stage1_arrays(out[0], out[1])
        lim = out[2] if len(out) > 2 else None
        pipe._wm_tls.prefetch = {}
        job = pipe._coverage_begin_fast(
            "yorin", eng._coverage_setup, depth, s1, lim_ids=lim)
        ids = job["worklist_ids"]
        return set(ids[(ids >= 0) & (ids < model.doc_keys_arr.size)]
                   .tolist())

    shallow = worklist(500)
    deep = worklist(2000)
    assert shallow <= deep, sorted(shallow - deep)[:10]
