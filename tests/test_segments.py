"""Disk segments: write/read round-trip, flush + search parity, merge
(reference: SegmentTests.cs, SegmentTrackingTests.cs)."""

import os

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.index.segments import (SegmentReader, SegmentWriter,
                                        merge_segments)

TITLES = ["The Shawshank Redemption", "The Godfather", "Redemption Day",
          "Star Wars", "Star Trek", "Batman Begins", "Inception",
          "Interstellar", "Speed", "New York Stories"]


class TestSegmentFile:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "seg1.ifts")
        postings = {
            "abc": ([0, 3, 7], [2, 1, 3]),
            "zzz": ([1], [255]),
            "mid": ([0, 1, 2, 3, 4], [1, 1, 1, 1, 1]),
        }
        SegmentWriter().write_segment(postings, doc_count=8, doc_base=0,
                                      path=path)
        reader = SegmentReader(path)
        assert reader.term_count == 3
        assert reader.terms == sorted(postings)
        for term, (ids, ws) in postings.items():
            docs, weights = reader.get_postings(term)
            assert docs.tolist() == ids
            assert weights.tolist() == ws
            assert reader.get_df(term) == len(ids)
        assert reader.get_postings("nope") is None
        reader.close()

    def test_doc_base_offsets(self, tmp_path):
        path = str(tmp_path / "seg2.ifts")
        SegmentWriter().write_segment({"t": ([100, 105], [1, 2])},
                                      doc_count=10, doc_base=100, path=path)
        reader = SegmentReader(path)
        docs, _ = reader.get_postings("t")
        assert docs.tolist() == [100, 105]
        rel, _ = reader.get_postings("t", absolute=False)
        assert rel.tolist() == [0, 5]
        reader.close()

    def test_corrupt_rejected(self, tmp_path):
        path = str(tmp_path / "seg3.ifts")
        SegmentWriter().write_segment({"t": ([0], [1])}, 1, 0, path)
        data = bytearray(open(path, "rb").read())
        data[-1] ^= 0xFF
        open(path, "wb").write(bytes(data))
        with pytest.raises(ValueError):
            SegmentReader(path)

    def test_prefix_enumeration(self, tmp_path):
        path = str(tmp_path / "seg4.ifts")
        SegmentWriter().write_segment(
            {t: ([0], [1]) for t in ["car", "cart", "cat", "dog"]},
            1, 0, path)
        reader = SegmentReader(path)
        ordinals = reader.terms_with_prefix("ca")
        assert [reader.terms[i] for i in ordinals] == ["car", "cart", "cat"]
        reader.close()

    def test_merge(self, tmp_path):
        p1, p2, out = (str(tmp_path / n) for n in ("a", "b", "m"))
        SegmentWriter().write_segment(
            {"x": ([0, 1], [1, 1]), "y": ([2], [2])}, 3, 0, p1)
        SegmentWriter().write_segment(
            {"x": ([3], [5]), "z": ([4], [1])}, 2, 3, p2)
        r1, r2 = SegmentReader(p1), SegmentReader(p2)
        merge_segments([r1, r2], out)
        merged = SegmentReader(out)
        docs, ws = merged.get_postings("x")
        assert docs.tolist() == [0, 1, 3]
        assert ws.tolist() == [1, 1, 5]
        assert merged.get_postings("z")[0].tolist() == [4]
        for r in (r1, r2, merged):
            r.close()


class TestFlushIntegration:
    def test_flush_then_search_parity(self, tmp_path):
        # Engine A: index everything in memory.
        eng_a = SearchEngine.create_default()
        eng_a.index_documents([Document(i, t) for i, t in enumerate(TITLES)])

        # Engine B: index half, flush to disk, index the rest.
        eng_b = SearchEngine.create_default()
        eng_b.index_documents([Document(i, t) for i, t in
                               enumerate(TITLES[:5])])
        eng_b.flush(str(tmp_path / "seg.ifts"))
        for i, t in enumerate(TITLES[5:], start=5):
            eng_b.index_document(Document(i, t))
        eng_b.calculate_weights()

        for query in ["shawshank", "redemption sh", "star w", "inter"]:
            ra = [(r.document_id, round(r.score, 3))
                  for r in eng_a.search(Query(query, 10)).records]
            rb = [(r.document_id, round(r.score, 3))
                  for r in eng_b.search(Query(query, 10)).records]
            assert ra == rb, (query, ra, rb)

    def test_flush_frees_memory_postings(self, tmp_path):
        eng = SearchEngine.create_default()
        eng.index_documents([Document(i, t) for i, t in enumerate(TITLES)])
        vocab_before = len(eng.vector_model.term_dict)
        eng.flush(str(tmp_path / "seg.ifts"))
        assert len(eng.vector_model.term_dict) == 0  # memory postings freed
        assert len(eng.vector_model.segments) == 1
        # still searchable
        r = eng.search(Query("shawshank", 5))
        doc = eng.get_document(r.records[0].document_id)
        assert doc.indexed_text == "The Shawshank Redemption"

    def test_save_after_flush_roundtrips(self, tmp_path):
        eng = SearchEngine.create_default()
        eng.index_documents([Document(i, t) for i, t in enumerate(TITLES)])
        eng.flush(str(tmp_path / "seg.ifts"))
        eng.save(str(tmp_path / "full.idx"))
        eng2 = SearchEngine.load(str(tmp_path / "full.idx"))
        r1 = [(e.document_id, round(e.score, 3))
              for e in eng.search(Query("redemption sh", 5)).records]
        r2 = [(e.document_id, round(e.score, 3))
              for e in eng2.search(Query("redemption sh", 5)).records]
        assert r1 == r2


class TestBlockPostings:
    """IFTS2 block format: variable 64-256-doc blocks, density-adaptive
    flush, per-block max-weight skip table, skip-table Advance
    (BlockPostingsWriter.cs:26-116, MMapBlockPostingsEnum.cs)."""

    def _write(self, tmp_path, docs, weights, term="term"):
        from infidex_tpu.index.segments import SegmentReader, SegmentWriter

        path = str(tmp_path / "seg.bin")
        SegmentWriter().write_segment({term: (docs, weights)},
                                      doc_count=max(docs) + 1 if docs else 0,
                                      doc_base=0, path=path)
        return SegmentReader(path)

    def test_roundtrip_multi_block(self, tmp_path):
        import numpy as np

        docs = list(range(0, 2000, 2))          # 1000 dense postings
        weights = [(d * 7) % 256 for d in docs]
        r = self._write(tmp_path, docs, weights)
        got_d, got_w = r.get_postings("term")
        np.testing.assert_array_equal(got_d, docs)
        np.testing.assert_array_equal(got_w, weights)
        mins, maxs, counts, max_w, offs = r.block_table(0)
        assert mins.size > 1                     # actually split into blocks
        assert counts.max() <= 256
        # skip-table metadata is exact
        pos = 0
        for b in range(mins.size):
            seg_w = weights[pos : pos + int(counts[b])]
            assert int(max_w[b]) == max(seg_w)
            assert int(mins[b]) == docs[pos]
            assert int(maxs[b]) == docs[pos + int(counts[b]) - 1]
            pos += int(counts[b])
        r.close()

    def test_density_adaptive_flush(self, tmp_path):
        # 64 dense docs then a huge gap: the sparse continuation must not
        # stretch the first block's spread
        docs = list(range(64)) + [100000 + i * 5000 for i in range(80)]
        weights = [1] * len(docs)
        r = self._write(tmp_path, docs, weights)
        mins, maxs, counts, _, _ = r.block_table(0)
        assert counts[0] >= 64
        assert int(maxs[0]) < 100000              # gap starts a new block
        r.close()

    def test_block_enum_advance_skips_blocks(self, tmp_path):
        from infidex_tpu.index.postings_enum import NO_MORE_DOCS

        docs = list(range(0, 5000, 2))
        weights = [(d % 200) + 1 for d in docs]
        r = self._write(tmp_path, docs, weights)
        e = r.postings_enum("term")
        assert e.cost() == len(docs)
        assert e.next_doc() == 0
        assert e.freq() == weights[0]
        assert e.advance(3001) == 3002            # first doc >= target
        assert e.freq() == weights[docs.index(3002)]
        assert e.advance(10**9) == NO_MORE_DOCS
        assert e.advance_calls == 2
        # per-block max-weight metadata is available for max-score bounds
        assert e.max_weight() == max(weights)
        r.close()

    def test_block_enum_iterates_everything(self, tmp_path):
        docs = sorted({(i * 37) % 10000 for i in range(900)})
        weights = [1 + (d % 255) for d in docs]
        r = self._write(tmp_path, docs, weights)
        e = r.postings_enum("term")
        seen = []
        d = e.next_doc()
        from infidex_tpu.index.postings_enum import NO_MORE_DOCS

        while d != NO_MORE_DOCS:
            seen.append((d, e.freq()))
            d = e.next_doc()
        assert [s[0] for s in seen] == docs
        assert [int(s[1]) for s in seen] == weights
        r.close()

    def test_terms_with_newline_roundtrip(self, tmp_path):
        # length-prefixed vocabulary: any term content survives
        import numpy as np

        r = self._write(tmp_path, [1, 2, 3], [9, 9, 9], term="we\nird")
        got = r.get_postings("we\nird")
        assert got is not None
        np.testing.assert_array_equal(got[0], [1, 2, 3])
        r.close()
