"""Native C++ kernels == Python oracles; auxiliary data structures
(roaring, trie, postings enums, tiered candidates, top-k heap, masks)."""

import random

import numpy as np
import pytest

import infidex_tpu.native as native
from infidex_tpu.core.shingle import Shingle, SystemStatus
from infidex_tpu.core.topk import TopKHeap
from infidex_tpu.filtering.mask import FilterCache, FilterMask
from infidex_tpu.index.candidates import TieredCandidateSelector
from infidex_tpu.index.inverted import InvertedIndex
from infidex_tpu.index.postings_enum import (NO_MORE_DOCS, ArrayPostingsEnum,
                                             CSRPostingsEnum,
                                             RoaringPostingsEnum)
from infidex_tpu.index.trie import TrieIndex
from infidex_tpu.tokenization.ngram_key import pack_ngram, unpack_ngram
from infidex_tpu.utils import metrics as m
from infidex_tpu.utils.roaring import RoaringBitmap

WORDS = ["shawshank", "redemption", "the", "newyork", "a", "ab", "abc",
         "knight", "dark", "darkk", "drak", "kniight", "star", "stir", ""]


def _perturb(rng, w):
    if len(w) < 3:
        return w
    i = rng.randrange(len(w) - 1)
    return w[:i] + w[i + 1] + w[i] + w[i + 2:]


class TestNativeMetrics:
    """C++ results must be bit-identical to the Python oracles (which the
    device kernels are property-tested against)."""

    def test_available(self):
        assert native.available, "native library failed to build/load"

    def test_damerau_matches_python(self):
        rng = random.Random(42)
        import importlib
        import infidex_tpu.utils.metrics as mm
        nat = mm._native
        mm._native = None  # pure-python oracle
        try:
            for _ in range(3000):
                a = _perturb(rng, rng.choice(WORDS))
                b = _perturb(rng, rng.choice(WORDS))
                md = rng.randint(0, 4)
                assert native.damerau(a, b, md) == \
                    m.calculate_damerau(a, b, md, False), (a, b, md)
                tol = rng.randint(0, 3)
                assert native.lcs(a, b, tol) == m.lcs(a, b, tol), (a, b, tol)
                assert native.prefix_distance(a, b, md) == \
                    m.calculate_prefix_distance(a, b, md,
                                                ignore_case=False), (a, b, md)
        finally:
            mm._native = nat

    def test_lcs_batch(self):
        docs = ["the shawshank redemption", "dark knight", "", "newyork"]
        out = native.lcs_batch("shawshank", docs, 1)
        assert out.tolist() == [m.lcs("shawshank", d, 1) for d in docs]

    def test_gvi_roundtrip_and_format(self):
        from infidex_tpu.utils import compression as comp
        rng = random.Random(7)
        for _ in range(50):
            n = rng.randint(0, 300)
            vals = [rng.randrange(2 ** rng.choice([8, 16, 24, 32]))
                    for _ in range(n)]
            enc = native.gvi_encode(np.asarray(vals, np.uint32))
            dec, consumed = comp.group_varint_decode(enc, n)
            assert dec.tolist() == vals
            assert consumed == len(enc)
            # byte-identical to the pure-python encoder
            nat = comp._native
            comp._native = None
            try:
                assert comp.group_varint_encode(vals) == enc
            finally:
                comp._native = nat


class TestRoaring:
    def test_set_algebra(self):
        rng = random.Random(3)
        a = sorted(rng.sample(range(200000), 6000))
        b = sorted(rng.sample(range(200000), 100))
        ra, rb = RoaringBitmap.from_sorted(a), RoaringBitmap.from_sorted(b)
        sa, sb = set(a), set(b)
        assert len(ra) == len(sa)
        assert set((ra | rb).to_array().tolist()) == sa | sb
        assert set((ra & rb).to_array().tolist()) == sa & sb
        assert set((ra ^ rb).to_array().tolist()) == sa ^ sb
        assert set(ra.and_not(rb).to_array().tolist()) == sa - sb
        assert (a[0] in ra) and (a[0] + 1 in ra) == (a[0] + 1 in sa)

    def test_serialize(self):
        rb = RoaringBitmap.from_sorted([1, 2, 70000, 70001, 200000])
        r2 = RoaringBitmap.deserialize(rb.serialize())
        assert r2.to_array().tolist() == rb.to_array().tolist()

    def test_empty(self):
        rb = RoaringBitmap()
        assert len(rb) == 0 and rb.to_array().size == 0


class TestTrie:
    TERMS = sorted(["star", "stars", "start", "stir", "the", "then",
                    "shawshank", "redemption", "a"])

    def test_exact_and_prefix(self):
        t = TrieIndex(self.TERMS)
        for i, w in enumerate(self.TERMS):
            assert t.exact(w) == i
        assert t.exact("nope") == -1 and t.exact("sta") == -1
        got = sorted(t.prefix_lookup("star"))
        want = [i for i, w in enumerate(self.TERMS) if w.startswith("star")]
        assert got == want

    def test_suffix_via_reverse(self):
        t = TrieIndex(self.TERMS, reverse=True)
        got = sorted(t.prefix_lookup("n"))
        want = [i for i, w in enumerate(self.TERMS) if w.endswith("n")]
        assert got == want
        assert t.exact("star") == self.TERMS.index("star")

    def test_ld1(self):
        t = TrieIndex(self.TERMS)
        got = {self.TERMS[i] for i in t.within_edit_one("stat")}
        want = {w for w in self.TERMS if m.levenshtein("stat", w) <= 1}
        assert got == want

    def test_enumerate(self):
        t = TrieIndex(self.TERMS)
        pairs = dict(t.enumerate_terms())
        assert pairs == {w: i for i, w in enumerate(self.TERMS)}


class TestPostingsEnums:
    def test_array_enum(self):
        e = ArrayPostingsEnum(np.array([1, 5, 9, 40]), np.array([3, 1, 2, 9]))
        assert e.doc() == -1
        assert e.next_doc() == 1 and e.freq() == 3.0
        assert e.advance(6) == 9
        assert e.advance(40) == 40 and e.freq() == 9.0
        assert e.next_doc() == NO_MORE_DOCS

    def test_roaring_enum_fixed_freq(self):
        e = RoaringPostingsEnum(RoaringBitmap.from_sorted([2, 4, 70000]))
        assert e.next_doc() == 2 and e.freq() == 1.0
        assert e.advance(5) == 70000

    def test_csr_enum(self):
        from infidex_tpu import Document, SearchEngine
        eng = SearchEngine.create_default()
        eng.index_documents([Document(0, "star wars"), Document(1, "star trek")])
        built = eng.vector_model.built
        tid = built.term_to_id.get("star")
        assert tid is not None
        e = CSRPostingsEnum(built, tid)
        docs = []
        while e.next_doc() != NO_MORE_DOCS:
            docs.append(e.doc())
        assert sorted(docs) == [0, 1]


class TestTieredCandidates:
    def _built(self):
        from infidex_tpu import Document, SearchEngine
        eng = SearchEngine.create_default()
        docs = [Document(i, f"alpha beta doc{i}") for i in range(20)]
        docs += [Document(100 + i, f"alpha gamma x{i}") for i in range(5)]
        eng.index_documents(docs)
        return eng.vector_model.built

    def test_single_term_union(self):
        built = self._built()
        sel = TieredCandidateSelector(built)
        tid = built.term_to_id["alpha"]
        cands, tier = sel.select([tid], [1.0], 10)
        assert tier == "union" and cands.size == 25

    def test_intersection_tiers(self):
        built = self._built()
        sel = TieredCandidateSelector(built)
        t1, t2 = built.term_to_id["alpha"], built.term_to_id["beta"]
        idf = [0.1, 1.0]
        cands, tier = sel.select([t1, t2], idf, 5)
        inter = set(cands.tolist())
        assert all(d < 20 for d in inter) and len(inter) == 20


class TestMiscStructures:
    def test_topk_heap(self):
        from infidex_tpu.index.vector_model import ScoreEntry
        h = TopKHeap(2)
        h.extend([ScoreEntry(1.0, 1), ScoreEntry(5.0, 2), ScoreEntry(3.0, 3)])
        assert [e.score for e in h.sorted_entries()] == [5.0, 3.0]
        assert h.threshold == 3.0

    def test_filter_mask(self):
        m1 = FilterMask.from_ids(8, [0, 2]); m2 = FilterMask.from_ids(8, [2, 3])
        assert m1.and_(m2).ids().tolist() == [2]
        assert m1.not_().count() == 6

    def test_filter_cache_lru(self):
        c = FilterCache(2)
        c.put("a", 1); c.put("b", 2); c.get("a"); c.put("c", 3)
        assert c.get("b") is None and c.get("a") == 1 and c.get("c") == 3

    def test_ngram_key(self):
        for s in ["a", "ab", "abc"]:
            assert unpack_ngram(pack_ngram(s)) == s
        assert pack_ngram("abcd") is None

    def test_shingle_and_status(self):
        s = Shingle("star", 2, 7)
        assert "star" in str(s)
        st = SystemStatus(is_indexed=True, document_count=5)
        assert st.document_count == 5

    def test_inverted_index(self):
        ii = InvertedIndex()
        ii.add("star", 0); ii.add("star", 1, 0.5)
        assert ii.document_frequency("star") == 2
        assert "star" in ii and len(ii) == 1
