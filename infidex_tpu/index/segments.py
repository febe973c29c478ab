"""On-disk index segments: write, memory-mapped read, k-way merge.

Behavioral reference: Infidex ``Indexing/Segments/*`` — segment file
("INFS" v1) holding per-term block postings (GroupVarInt delta doc ids +
raw byte weights), a term index, and section offsets; ``SegmentReader``
memory-maps the file; ``SegmentMerger`` k-way merges sorted term streams
with doc-base remapping.

TPU-native format "IFTS1": sections are flat arrays designed to be lifted
straight into the HBM CSR image —

  header   magic 'IFTS1\\0' | version u16 | term_count u32 | doc_count u32 |
           doc_base u32 | 3 section offsets u64 + total size u64 + crc32
  terms    '\\n'-joined UTF-8 term strings (sorted), plus df i32[T]
  offsets  posting CSR offsets i64[T+1] (into the postings section, counts)
  postings per term: GroupVarInt(delta doc ids) then raw weight bytes

Doc ids inside a segment are segment-relative; readers add ``doc_base``.
"""

from __future__ import annotations

import mmap
import os
import struct
import zlib
from bisect import bisect_left, bisect_right
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..utils.compression import (delta_decode, delta_encode,
                                 group_varint_decode, group_varint_encode)

MAGIC = b"IFTS1\x00"
VERSION = 1


class SegmentWriter:
    """Writes a sorted-term segment file from in-memory postings."""

    def write_segment(self, terms_postings: Dict[str, Tuple[List[int], List[int]]],
                      doc_count: int, doc_base: int, path: str) -> None:
        """terms_postings: term -> (doc_ids ascending, byte weights)."""
        terms = sorted(terms_postings.keys())
        T = len(terms)

        for t in terms:
            if "\n" in t:
                raise ValueError(
                    f"segment term contains newline (would corrupt the "
                    f"vocabulary table): {t!r}")
        term_blob = "\n".join(terms).encode("utf-8")
        dfs = np.zeros(T, dtype=np.int32)
        offsets = np.zeros(T + 1, dtype=np.int64)
        postings_chunks: List[bytes] = []
        pos = 0
        for i, t in enumerate(terms):
            doc_ids, weights = terms_postings[t]
            dfs[i] = len(doc_ids)
            rel = np.asarray(doc_ids, dtype=np.int64) - doc_base
            encoded = group_varint_encode(delta_encode(rel).tolist())
            w = bytes(int(x) & 0xFF for x in weights)
            chunk = struct.pack("<ii", len(doc_ids), len(encoded)) + encoded + w
            postings_chunks.append(chunk)
            pos += len(chunk)
            offsets[i + 1] = pos

        postings_blob = b"".join(postings_chunks)
        body = (
            struct.pack("<i", len(term_blob)) + term_blob +
            dfs.tobytes() + offsets.tobytes() + postings_blob
        )
        crc = zlib.crc32(body) & 0xFFFFFFFF
        header = MAGIC + struct.pack(
            "<HIIIQI", VERSION, T, doc_count, doc_base, len(body), crc)
        with open(path, "wb") as fh:
            fh.write(header)
            fh.write(body)


class SegmentReader:
    """Memory-mapped segment with sorted-term binary search."""

    def __init__(self, path: str):
        self.path = path
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        if self._mm[: len(MAGIC)] != MAGIC:
            raise ValueError(f"bad segment magic in {path}")
        (version, term_count, doc_count, doc_base, body_len, crc) = \
            struct.unpack_from("<HIIIQI", self._mm, len(MAGIC))
        if version != VERSION:
            raise ValueError(f"unsupported segment version {version}")
        self.term_count = term_count
        self.doc_count = doc_count
        self.doc_base = doc_base
        header_len = len(MAGIC) + struct.calcsize("<HIIIQI")
        body = bytes(self._mm[header_len : header_len + body_len])
        if (zlib.crc32(body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"segment checksum mismatch in {path}")

        off = header_len
        (term_blob_len,) = struct.unpack_from("<i", self._mm, off)
        off += 4
        term_blob = bytes(self._mm[off : off + term_blob_len])
        off += term_blob_len
        self.terms: List[str] = (
            term_blob.decode("utf-8").split("\n") if term_blob else [])
        if len(self.terms) != term_count:
            raise ValueError(
                f"segment vocabulary misaligned in {path}: "
                f"{len(self.terms)} terms decoded, header says {term_count}")
        self.dfs = np.frombuffer(self._mm, np.int32, term_count, off).copy()
        off += term_count * 4
        self.offsets = np.frombuffer(
            self._mm, np.int64, term_count + 1, off).copy()
        off += (term_count + 1) * 8
        self._postings_base = off

    # ------------------------------------------------------------------
    def term_index(self, term: str) -> int:
        i = bisect_left(self.terms, term)
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return -1

    def get_df(self, term: str) -> int:
        i = self.term_index(term)
        return int(self.dfs[i]) if i >= 0 else 0

    def get_postings(self, term: str,
                     absolute: bool = True) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        i = self.term_index(term)
        if i < 0:
            return None
        return self.get_postings_by_ordinal(i, absolute)

    def get_postings_by_ordinal(self, ordinal: int,
                                absolute: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        start = self._postings_base + int(self.offsets[ordinal])
        count, enc_len = struct.unpack_from("<ii", self._mm, start)
        enc = bytes(self._mm[start + 8 : start + 8 + enc_len])
        deltas, _ = group_varint_decode(enc, count)
        doc_ids = delta_decode(deltas)
        if absolute:
            doc_ids = doc_ids + self.doc_base
        w_start = start + 8 + enc_len
        weights = np.frombuffer(self._mm, np.uint8, count, w_start).copy()
        return doc_ids.astype(np.int64), weights

    def terms_with_prefix(self, prefix: str, limit: int = 4096) -> List[int]:
        lo = bisect_left(self.terms, prefix)
        hi = bisect_right(self.terms, prefix + "￿")
        return list(range(lo, min(hi, lo + limit)))

    def iter_terms(self) -> Iterator[Tuple[str, int]]:
        for i, t in enumerate(self.terms):
            yield t, i

    def close(self) -> None:
        self._mm.close()
        self._file.close()


def merge_segments(readers: List[SegmentReader], out_path: str,
                   doc_base: int = 0) -> None:
    """K-way merge of sorted term streams with doc-base remapping
    (SegmentMerger.cs semantics)."""
    merged: Dict[str, Tuple[List[int], List[int]]] = {}
    total_docs = sum(r.doc_count for r in readers)
    for reader in readers:
        for term, ordinal in reader.iter_terms():
            doc_ids, weights = reader.get_postings_by_ordinal(ordinal, True)
            entry = merged.setdefault(term, ([], []))
            entry[0].extend(int(d) for d in doc_ids)
            entry[1].extend(int(w) for w in weights)
    # doc ids across segments are disjoint and segment order is doc order,
    # but sort defensively to keep the postings invariant.
    for term, (ids, ws) in merged.items():
        order = np.argsort(np.asarray(ids), kind="stable")
        merged[term] = ([ids[i] for i in order], [ws[i] for i in order])
    SegmentWriter().write_segment(merged, total_docs, doc_base, out_path)
