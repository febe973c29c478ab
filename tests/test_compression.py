"""Compression kernel tests (reference: EliasFanoTests, DArrayTests,
CompactArrayTests, and GroupVarInt round-trips)."""

import random

import numpy as np
import pytest

from infidex_tpu.utils.compression import (BitSet, CompactArray, DArray,
                                           EliasFano, delta_decode,
                                           delta_encode, group_varint_decode,
                                           group_varint_encode)


class TestBitSet:
    def test_set_get(self):
        bs = BitSet(200)
        for p in (0, 63, 64, 127, 199):
            bs.set(p)
        assert all(bs.get(p) for p in (0, 63, 64, 127, 199))
        assert not bs.get(1)

    def test_positions(self):
        bs = BitSet(300)
        positions = [5, 64, 65, 250]
        for p in positions:
            bs.set(p)
        assert bs.set_positions().tolist() == positions


class TestCompactArray:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_roundtrip(self, seed):
        rng = random.Random(seed)
        values = [rng.randrange(0, 2**rng.randrange(1, 40)) for _ in range(500)]
        ca = CompactArray.create(values)
        assert [ca.get(i) for i in range(len(values))] == values
        got = ca.get_many(np.arange(len(values)))
        assert got.tolist() == values

    def test_zeros(self):
        ca = CompactArray.create([0, 0, 0])
        assert ca.width == 1
        assert [ca.get(i) for i in range(3)] == [0, 0, 0]

    def test_empty(self):
        ca = CompactArray.create([])
        assert ca.count == 0


class TestDArray:
    @pytest.mark.parametrize("density", [0.01, 0.3, 0.9])
    def test_select(self, density):
        rng = random.Random(42)
        n = 5000
        bs = BitSet(n)
        positions = sorted(rng.sample(range(n), int(n * density)))
        for p in positions:
            bs.set(p)
        d = DArray.build(bs, select1=True)
        for rank in range(0, len(positions), 7):
            assert d.select(bs, rank) == positions[rank]

    def test_sparse_overflow_blocks(self):
        # > 2^16 spread within one 1024-one block triggers the overflow path
        bs = BitSet(1 << 21)
        positions = [i * 1500 for i in range(1200)]
        for p in positions:
            bs.set(p)
        d = DArray.build(bs, select1=True)
        for rank in (0, 31, 32, 1023, 1024, 1199):
            assert d.select(bs, rank) == positions[rank]


class TestEliasFano:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        rng = random.Random(seed)
        data = sorted(rng.sample(range(10**7), 2000))
        ef = EliasFano.encode(data)
        assert ef.to_list() == data
        got = ef.get_many(np.arange(len(data)))
        assert got.tolist() == data

    def test_serialize(self):
        data = sorted(random.Random(9).sample(range(10**6), 500))
        ef = EliasFano.encode(data)
        blob = ef.write()
        restored, consumed = EliasFano.read(blob)
        assert consumed == len(blob)
        assert restored.to_list() == data

    def test_dense(self):
        data = list(range(100))
        ef = EliasFano.encode(data)
        assert ef.to_list() == data

    def test_empty(self):
        assert EliasFano.encode([]).count == 0


class TestGroupVarInt:
    @pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 5, 100, 1001])
    def test_roundtrip(self, n):
        rng = random.Random(n)
        values = [rng.randrange(0, 2**rng.randrange(1, 32)) for _ in range(n)]
        blob = group_varint_encode(values)
        decoded, consumed = group_varint_decode(blob, n)
        assert decoded.tolist() == values
        assert consumed == len(blob)

    def test_delta(self):
        ids = np.array(sorted(random.Random(3).sample(range(10**6), 300)))
        deltas = delta_encode(ids)
        assert delta_decode(deltas).tolist() == ids.tolist()


# ---------------------------------------------------------------------------
# AutoSegmenter (reference: AutoSegmenterTests.cs)

from infidex_tpu.core.segmenter import (AutoSegmenter, CoreDocument,
                                        segments_required)

DELIMS = [" ", "-", ",", "."]


class TestAutoSegmenter:
    def test_short_doc_not_segmented(self):
        seg = AutoSegmenter(0.2, 200, DELIMS)
        docs = seg.segment_documents([CoreDocument(1, 0, "short text")])
        assert len(docs) == 1
        assert docs[0].segment_number == 0

    def test_long_doc_segmented_with_overlap(self):
        seg = AutoSegmenter(0.2, 200, DELIMS)
        text = " ".join(f"word{i}" for i in range(120))  # ~800 chars
        docs = seg.segment_documents([CoreDocument(7, 0, text)])
        assert len(docs) > 1
        assert [d.segment_number for d in docs] == list(range(len(docs)))
        assert all(d.document_key == 7 for d in docs)
        # overlapping: consecutive segments share words
        for a, b in zip(docs, docs[1:]):
            a_words = set(a.indexed_text.split())
            b_words = set(b.indexed_text.split())
            assert a_words & b_words, "segments should overlap"
        # full coverage: every word appears in some segment
        all_words = set(text.split())
        seg_words = set()
        for d in docs:
            seg_words.update(d.indexed_text.split())
        assert seg_words == all_words

    def test_first_segment_keeps_original(self):
        seg = AutoSegmenter(0.2, 100, DELIMS)
        text = " ".join(f"w{i}" for i in range(100))
        docs = seg.segment_documents([CoreDocument(1, 0, text)])
        assert docs[0].reserved == text
        assert docs[1].reserved == ""

    def test_segments_required(self):
        assert segments_required([CoreDocument(1, 0, "x" * 400)], 300)
        assert not segments_required([CoreDocument(1, 0, "x" * 100)], 300)

    def test_single_word_not_segmented(self):
        seg = AutoSegmenter(0.2, 50, DELIMS)
        docs = seg.segment_documents([CoreDocument(1, 0, "x" * 500)])
        assert len(docs) == 1
