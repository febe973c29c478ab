"""Stage-1 relevancy model: tokenization, term stats, fuzzy expansion, BM25.

Behavioral reference: Infidex ``Indexing/VectorModel.cs``:

* ``index_document`` (:73-112): concat searchable fields, normalize + lower +
  synonym-canonicalize, emit n-grams + words with per-position field weights,
  accumulate postings, feed the short-query prefix index.
* ``search`` (:376-602): tokenize query -> exact term-id lookup -> sort +
  dedupe with occurrence counts -> fuzzy-expand unknown tokens of len >= 4
  into LD1 "virtual terms" (:643-743, LRU-cached) -> BM25 top-k.
* ``build_inverted_lists`` (:130-220): doc lengths = sum of posting weights,
  avgdl; word-level IDF cache (:864-908); document metadata cache (:250-313).

TPU-native design: the scoring work happens in index/device.py as one dense
XLA program; this module is the host-side orchestration plus the symmetric-
delete LD1 expansion index (replacing the reference's FST Myers traversal
with an exact-verified delete-variant hash lookup; the MXU signature-matmul
variant lives in ops/fuzzy.py as the large-corpus path).
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import DEFAULT_FIELD_WEIGHTS
from ..core.documents import Document, DocumentCollection
from ..tokenization.tokenizer import Tokenizer
from ..utils.metrics import levenshtein
from .builder import BuiltIndex, TermDictionary, TermPostings, finalize_postings
from .device import DeviceIndex, compute_idf


@dataclass
class ScoreEntry:
    """Search result entry (Core/ScoreEntry.cs): ordering is score desc,
    tiebreaker desc, document_key asc."""

    score: float
    document_id: int  # public DocumentKey
    tiebreaker: int = 0
    segment_number: Optional[int] = None

    def sort_key(self):
        return (-self.score, -self.tiebreaker, self.document_id)


class Stage1Arrays:
    """Array-form Stage-1 results for the vectorized batch pipeline.

    Valid only on the 1:1 id<->key fast path (no multi-segment docs):
    rows are score-descending, keys unique, all docs live.
    """

    __slots__ = ("scores", "iids", "keys")

    def __init__(self, scores: np.ndarray, iids: np.ndarray,
                 keys: np.ndarray):
        self.scores = scores
        self.iids = iids
        self.keys = keys

    def __len__(self) -> int:
        return int(self.scores.size)

    def truncated(self, n: int) -> "Stage1Arrays":
        if len(self) <= n:
            return self
        return Stage1Arrays(self.scores[:n], self.iids[:n], self.keys[:n])

    def to_entries(self, limit: Optional[int] = None) -> List["ScoreEntry"]:
        n = len(self) if limit is None else min(limit, len(self))
        return [ScoreEntry(float(s), int(k))
                for s, k in zip(self.scores[:n].tolist(),
                                self.keys[:n].tolist())]


@dataclass
class DocumentMetadata:
    first_token: str = ""
    token_count: int = 0

    @property
    def has_tokens(self) -> bool:
        return self.token_count > 0


class _LruCache:
    def __init__(self, capacity: int = 1000):
        self._d: "OrderedDict[str, object]" = OrderedDict()
        self._cap = capacity

    def get(self, key: str):
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
        return v

    def put(self, key: str, value) -> None:
        if key in self._d:
            self._d.move_to_end(key)
        self._d[key] = value
        if len(self._d) > self._cap:
            self._d.popitem(last=False)


def _delete_variants(term: str) -> List[str]:
    return [term[:i] + term[i + 1 :] for i in range(len(term))]


class VectorModel:
    """Host orchestration of the Stage-1 index."""

    #: widen fuzzy term expansion to Damerau-LD1 (see _fuzzy_verify);
    #: False restores strict reference LD1 semantics.
    fuzzy_transpositions: bool = __import__("os").environ.get(
        "INFIDEX_TPU_FUZZY_DAMERAU", "1") != "0"

    def __init__(
        self,
        tokenizer: Tokenizer,
        stop_term_limit: int = 1_250_000,
        field_weights: Optional[Sequence[float]] = None,
        synonym_map=None,
    ):
        self.tokenizer = tokenizer
        self.stop_term_limit = stop_term_limit
        self.field_weights = tuple(field_weights or DEFAULT_FIELD_WEIGHTS)
        self.synonym_map = synonym_map

        self.documents = DocumentCollection()
        self.term_dict = TermDictionary()

        self.built: Optional[BuiltIndex] = None
        self.device: Optional[DeviceIndex] = None
        self.word_idf_cache: Dict[str, float] = {}
        self.doc_metadata: List[DocumentMetadata] = []
        self.deleted_arr = np.zeros(0, bool)
        self.doc_keys_arr = np.zeros(0, np.int64)

        # LD1 expansion structures (built lazily at finalize)
        self._ld1_index: Optional[Dict[str, List[int]]] = None
        self._sig_index = None  # MXU signature matcher (ops/fuzzy.py)
        self._tiered_stage1 = None  # host tier selector (index/candidates.py)
        self._fuzzy_cache = _LruCache(1000)

        # Short-query positional prefix index, wired by the engine
        self.short_query_index = None
        self.short_query_resolver = None

        # Mesh-sharded serving (parallel/sharding.py): set by
        # enable_sharding; rebuilt after every index rebuild.
        self._mesh = None
        self.sharded = None
        self.sharded_tables = None

        # Device coverage tables (ops/coverage_kernel.CoverageTables)
        self.coverage_tables = None
        # First-token candidate prior (index/first_token.py)
        self.first_token_index = None
        # object-dtype array of normalized doc texts (set with the tables)
        self.norm_texts: Optional[np.ndarray] = None

        # Bulk-build CSR image awaiting materialization (native/bulk.py)
        self._bulk_csr = None

        # Append-only fast finalize (index/append.py): postings of docs
        # added onto a finalized base accumulate here until the next
        # calculate_weights; (start, count) of the last append-finalize
        # steers the derived-structure appends.
        self._delta = None
        self._last_append: Optional[Tuple[int, int]] = None
        self._doc_epoch_at_finalize = -1
        self._derived_doc_epoch = -1
        self._derived_syn_epoch = -2
        self._word_df: Optional[Dict[str, int]] = None
        self._last_new_terms: Optional[Tuple[int, int]] = None

        # On-disk segments created by flush() (index/segments.py)
        self._segments = []           # List[SegmentReader]
        self._flushed_doc_count = 0
        # Memory-bounded segment serving (index/mmap_serving.py):
        # flush(materialize=False) keeps flushed postings on disk.
        self.mmap_serving = False
        self._mmap_stage1 = None
        self._host_stage1 = None
        self._segment_catalog = {}
        self._flushed_doc_lengths = np.zeros(0, np.float32)

    # ------------------------------------------------------------------
    # Indexing

    def normalize_doc_text(self, text: str) -> str:
        if self.tokenizer.text_normalizer is not None:
            text = self.tokenizer.text_normalizer.normalize(text)
        text = text.lower()
        if self.synonym_map is not None and self.synonym_map.has_canonical_mappings:
            delims = (
                self.tokenizer.tokenizer_setup.delimiters
                if self.tokenizer.tokenizer_setup
                else (" ",)
            )
            text = self.synonym_map.canonicalize_text(text, delims)
        return text

    # ------------------------------------------------------------------
    # Native bulk build (native/bulk.py): one C++ pass for tokenize ->
    # term dict -> postings accumulation (+ WordMatcher / prefix index).

    def bulk_index_documents(self, doc_list: List[Document],
                             word_matcher=None, progress=None,
                             monitor=None, chunk: int = 4096) -> None:
        """Fast fresh-index build; semantics identical to per-doc
        index_document + WordMatcher.load + prefix indexing (pinned by
        tests/test_bulk_build_parity.py). Only valid on an empty index."""
        from ..native.bulk import BulkIndexer

        assert len(self.term_dict) == 0 and not self._segments
        setup = self.tokenizer.tokenizer_setup
        delims = setup.delimiters if setup else (" ",)
        remove_dups = setup.remove_duplicate_tokens if setup else True
        sq = self.short_query_index
        indexer = BulkIndexer(
            self.tokenizer.index_sizes, self.tokenizer.start_pad_size,
            self.tokenizer.stop_pad_size, delims, remove_dups,
            self.stop_term_limit, self.field_weights,
            wm_setup=word_matcher._setup if word_matcher is not None else None,
            sq_minmax=((sq.min_prefix_length, sq.max_prefix_length)
                       if sq is not None else None))
        try:
            norm = self.tokenizer.text_normalizer
            total = len(doc_list)
            done = 0
            for lo in range(0, total, chunk):
                batch = doc_list[lo : lo + chunk]
                mains, sqs, wms, ids, conts, bounds = [], [], [], [], [], []
                for document in batch:
                    if monitor is not None and monitor.is_cancelled:
                        raise InterruptedError("indexing cancelled")
                    doc = self.documents.add_document(document)
                    boundaries, concatenated = \
                        document.fields.get_searchable_texts("§")
                    doc.indexed_text = concatenated
                    index_text = self.normalize_doc_text(concatenated)
                    # tokenize_for_indexing re-normalizes its input; the
                    # C++ tokenizer receives the same doubly-normalized
                    # text so positions and grams match exactly.
                    mains.append(norm.normalize(index_text)
                                 if norm is not None else index_text)
                    sqs.append(index_text if sq is not None else "")
                    wms.append(word_matcher._normalize(concatenated)
                               if word_matcher is not None else "")
                    ids.append(doc.id)
                    conts.append(doc.segment_number > 0)
                    bounds.append(boundaries)
                indexer.add_chunk(mains, sqs, wms, ids, conts, bounds)
                done += len(batch)
                if progress is not None and total > 0:
                    progress(int(done * 50.0 / total))

            terms, term_offsets, docs_arr, weights_arr, dfs = \
                indexer.export_terms()
            self.term_dict = TermDictionary()
            self.term_dict.terms = terms
            self.term_dict.term_to_id = {t: i for i, t in enumerate(terms)}
            self.term_dict.postings = []  # materialized on first mutation
            self._bulk_csr = (term_offsets, docs_arr, weights_arr, dfs)

            if word_matcher is not None:
                word_matcher.load_bulk(indexer.export_wm(0),
                                       indexer.export_wm(1),
                                       indexer.export_wm(2))
            if sq is not None:
                sq.load_bulk(indexer.export_sq())
        finally:
            indexer.close()
        self.built = None

    def _materialize_bulk(self) -> None:
        """Convert the bulk CSR image into mutable TermPostings lists so
        the incremental path can continue appending."""
        csr = getattr(self, "_bulk_csr", None)
        if csr is None:
            return
        term_offsets, docs_arr, weights_arr, dfs = csr
        postings = []
        for t in range(len(self.term_dict.terms)):
            p = TermPostings()
            p.df = int(dfs[t])
            s, e = int(term_offsets[t]), int(term_offsets[t + 1])
            p.doc_ids = docs_arr[s:e].tolist()
            p.weights = weights_arr[s:e].tolist()
            postings.append(p)
        self.term_dict.postings = postings
        self._bulk_csr = None

    def _delta_eligible(self) -> bool:
        """Appends can accumulate in an AppendDelta (index/append.py —
        O(delta) fast finalize) when a finalized base image exists and
        every live document is in it. Disk segments and mmap serving
        keep the materialized slow path; INFIDEX_TPU_APPEND_FINALIZE=0
        forces the slow path everywhere (parity twin for tests)."""
        import os as _os

        return (self.built is not None
                and self.built.num_docs == len(self.documents)
                and not self._segments
                and not self.mmap_serving
                and _os.environ.get("INFIDEX_TPU_APPEND_FINALIZE", "1")
                != "0")

    def index_document(self, document: Document) -> Document:
        if self._delta is None and self._delta_eligible():
            from .append import AppendDelta

            self._delta = AppendDelta(start_doc=len(self.documents),
                                      base_terms=len(self.built.terms))
        if self._delta is not None:
            return self._index_document_delta(document)
        self._materialize_bulk()
        doc = self.documents.add_document(document)
        is_continuation = doc.segment_number > 0

        boundaries, concatenated = document.fields.get_searchable_texts("§")
        doc.indexed_text = concatenated

        index_text = self.normalize_doc_text(concatenated)

        remove_dups = (
            self.tokenizer.tokenizer_setup.remove_duplicate_tokens
            if self.tokenizer.tokenizer_setup
            else True
        )

        for token, pos in self.tokenizer.tokenize_for_indexing(index_text, is_continuation):
            fw = self._field_weight_at(pos, boundaries)
            tid, _ = self.term_dict.get_or_add(token)
            postings = self.term_dict.postings[tid]
            postings.increment_usage(self.stop_term_limit)
            postings.first_cycle_add(doc.id, self.stop_term_limit, remove_dups, fw)

        if self.short_query_index is not None:
            self.short_query_index.index_document(index_text, doc.id)

        # Derived structures are stale until the next finalize, but the
        # previous ``built`` image (an immutable CSR snapshot) keeps
        # serving: a live engine must not go dark between an add and the
        # next calculate_weights (reference: accumulate-then-
        # CalculateWeights, SearchEngine.cs:165-185 — the new document
        # becomes searchable at finalize).
        return doc

    def _index_document_delta(self, document: Document) -> Document:
        """``index_document`` with postings accumulated in the delta
        instead of materialized per-term lists — token stream, field
        weights, stop-term counting and short-query indexing identical."""
        doc = self.documents.add_document(document)
        is_continuation = doc.segment_number > 0

        boundaries, concatenated = document.fields.get_searchable_texts("§")
        doc.indexed_text = concatenated
        index_text = self.normalize_doc_text(concatenated)

        remove_dups = (
            self.tokenizer.tokenizer_setup.remove_duplicate_tokens
            if self.tokenizer.tokenizer_setup
            else True
        )
        delta = self._delta
        built = self.built
        for token, pos in self.tokenizer.tokenize_for_indexing(
                index_text, is_continuation):
            fw = self._field_weight_at(pos, boundaries)
            st = delta.get_or_add(token, built)
            st.increment_usage(self.stop_term_limit)
            st.first_cycle_add(doc.id, self.stop_term_limit, remove_dups, fw)

        if self.short_query_index is not None:
            self.short_query_index.index_document(index_text, doc.id)
        return doc

    def _drain_delta(self) -> None:
        """Materialize pending delta postings into the mutable term
        dictionary (slow-path fallback: flush()/segment building read
        ``term_dict.postings`` directly)."""
        if self._delta is None:
            return
        delta, self._delta = self._delta, None
        self._materialize_bulk()
        delta.drain_into_term_dict(self.term_dict)

    def _field_weight_at(self, token_pos: int, boundaries) -> float:
        if not boundaries:
            return 1.0
        weight_index = 0
        for pos, widx in boundaries:
            if pos <= token_pos:
                weight_index = widx
            else:
                break
        if weight_index < len(self.field_weights):
            return self.field_weights[weight_index]
        return 1.0

    def build_inverted_lists(self) -> None:
        """Finalize postings into CSR tensors + device upload + derived stats."""
        n = len(self.documents)  # internal id slots, incl. deleted
        append_base: Optional[Tuple[int, int]] = None
        new_stop_tids: list = []
        self._last_new_terms = None
        if self._delta is not None and self._segments:
            self._drain_delta()  # unreachable via public paths; safe anyway
        if self._delta is not None:
            # Append-only fast finalize (index/append.py): O(delta)
            # accumulation merged around the immutable base CSR instead
            # of O(corpus) list materialization + finalize_postings.
            from .append import fast_merge_built

            delta, self._delta = self._delta, None
            append_base = (delta.start_doc, n - delta.start_doc)
            self._last_new_terms = (delta.base_terms, delta.n_new_terms)
            new_stop_tids = [st.tid for st in delta.states.values()
                             if st.newly_stopped]
            base_t = len(self.term_dict.terms)
            for i, t in enumerate(delta.new_terms):
                self.term_dict.term_to_id[t] = base_t + i
            self.term_dict.terms.extend(delta.new_terms)
            self.built = fast_merge_built(self.built, delta, n)
            # the merged image aliases the live term dictionary (the base
            # image may hold a pre-extension copy from finalize_postings)
            self.built.terms = self.term_dict.terms
            self.built.term_to_id = self.term_dict.term_to_id
            # Keep the invariant every slow-path consumer relies on:
            # _bulk_csr mirrors the finalized image, term_dict postings
            # rematerialize from it on first mutation/flush.
            self._bulk_csr = (self.built.term_offsets,
                              self.built.postings_docs,
                              self.built.postings_weights, self.built.df)
            self.term_dict.postings = []
        elif self._segments and self.mmap_serving:
            from .mmap_serving import MmapStage1, build_union_index

            self._materialize_bulk()
            self.built = build_union_index(self, n)
            self._mmap_stage1 = MmapStage1(self, device_stream=True)
        elif self._segments:
            self._materialize_bulk()
            self.built = self._build_unified_csr(n)
            self._mmap_stage1 = None
        elif getattr(self, "_bulk_csr", None) is not None:
            self.built = self._built_from_bulk_csr(n)
        else:
            self.built = finalize_postings(self.term_dict, n)

        epoch_clean = (append_base is not None
                       and self.documents.mutation_epoch
                       == self._doc_epoch_at_finalize)
        if (epoch_clean and self.deleted_arr.size == append_base[0]
                and self.doc_keys_arr.size == append_base[0]):
            start = append_base[0]
            k = n - start
            docs = self.documents
            deleted = np.concatenate([self.deleted_arr, np.fromiter(
                (docs.get_document(i).deleted for i in range(start, n)),
                bool, k)])
            self.deleted_arr = deleted
            self.doc_keys_arr = np.concatenate([self.doc_keys_arr,
                                                np.fromiter(
                (docs.get_document(i).document_key for i in range(start, n)),
                np.int64, k)])
        else:
            epoch_clean = False
            deleted = np.array(
                [self.documents.get_document(i).deleted for i in range(n)],
                dtype=bool) if n else np.zeros(0, bool)
            # Dense per-internal-id arrays for vectorized candidate
            # handling (Python loops over WordMatcher hit lists scale
            # with df otherwise).
            self.deleted_arr = deleted
            self.doc_keys_arr = np.array(
                [self.documents.get_document(i).document_key
                 for i in range(n)],
                dtype=np.int64) if n else np.zeros(0, np.int64)
        self._doc_epoch_at_finalize = self.documents.mutation_epoch
        self.device = DeviceIndex(self.built, deleted)
        self._build_word_idf_cache(
            append=append_base if epoch_clean else None)
        # _ld1_index survives finalizes: _ensure_ld1_index extends it
        # append-only and self-checks for id remapping. The MXU signature
        # matrix likewise extends in place on append-only finalizes — its
        # fresh build is an O(vocab) Python loop (~10s+ at 1M) that used
        # to hit the first fuzzy query after every finalize.
        sig = self._sig_index
        if not (append_base is not None and sig is not None
                and sig.extend_append(self.built.terms, self.built.df,
                                      sig.v, new_stop_tids)):
            self._sig_index = None
        self._tiered_stage1 = None
        self._fuzzy_cache = _LruCache(1000)
        self._last_append = append_base
        if self._mesh is not None:
            self._build_sharded_index()

    calculate_weights = build_inverted_lists

    # ------------------------------------------------------------------
    # Disk segments (VectorModel.Flush, VectorModel.cs:804-820)

    def _built_from_bulk_csr(self, num_docs: int) -> BuiltIndex:
        """BuiltIndex directly from the native CSR (no per-term Python)."""
        term_offsets, docs_arr, weights_arr, dfs = self._bulk_csr
        doc_lengths = np.zeros(max(num_docs, 1), dtype=np.float32)
        np.add.at(doc_lengths, docs_arr, weights_arr.astype(np.float32))
        doc_lengths = doc_lengths[:num_docs]
        avgdl = float(doc_lengths.mean()) if num_docs > 0 else 0.0
        return BuiltIndex(
            terms=list(self.term_dict.terms),
            term_to_id=dict(self.term_dict.term_to_id),
            term_offsets=term_offsets,
            postings_docs=docs_arr,
            postings_weights=weights_arr,
            df=dfs,
            doc_lengths=doc_lengths,
            avgdl=avgdl,
            num_docs=num_docs,
        )

    def flush(self, segment_path: str, materialize: bool = True) -> None:
        """Roll the in-memory postings into an on-disk segment and free them.

        ``materialize=True`` (default): the unified CSR is rebuilt from all
        segments + (new) memory postings on the next build_inverted_lists,
        mirroring the reference's per-segment search + merge with a repack
        program. ``materialize=False``: memory-bounded serving — flushed
        postings stay on disk and are decoded lazily per query
        (index/mmap_serving.py; MMapBlockPostingsEnum.cs capability)."""
        self._drain_delta()
        self._materialize_bulk()
        from .builder import TermDictionary
        from .segments import SegmentReader, SegmentWriter

        if len(self.term_dict) == 0:
            return
        terms_postings = {}
        lens = np.zeros(len(self.documents), np.float32)
        for tid, term in enumerate(self.term_dict.terms):
            p = self.term_dict.postings[tid]
            if p.df > 0 and len(p.doc_ids):
                terms_postings[term] = (p.doc_ids, p.weights)
                np.add.at(lens, np.asarray(p.doc_ids, np.int64),
                          np.asarray(p.weights, np.float32))
        doc_count = len(self.documents) - self._flushed_doc_count
        SegmentWriter().write_segment(
            terms_postings, doc_count, self._flushed_doc_count, segment_path)
        self._segments.append(SegmentReader(segment_path))
        self._flushed_doc_count = len(self.documents)
        # capture flushed docs' BM25 lengths before the postings are freed
        # (mmap mode cannot recompute them without decoding every block)
        if self._flushed_doc_lengths.size < lens.size:
            grown = np.zeros(lens.size, np.float32)
            grown[: self._flushed_doc_lengths.size] = self._flushed_doc_lengths
            self._flushed_doc_lengths = grown
        self._flushed_doc_lengths[: lens.size] += lens
        self.term_dict = TermDictionary()
        self.built = None
        self.device = None
        if not materialize:
            self.mmap_serving = True

    def materialize_segments(self) -> None:
        """Exit mmap serving: decode every segment into the unified CSR
        (needed before save, which persists the unified image)."""
        if not self.mmap_serving:
            return
        self.mmap_serving = False
        self._mmap_stage1 = None
        self._segment_catalog = {}
        self.built = None
        self.device = None
        self.build_inverted_lists()

    @property
    def segments(self):
        return list(self._segments)

    def _build_unified_csr(self, n_docs: int):
        """Merge segment postings + live memory postings into one BuiltIndex."""
        from .builder import BuiltIndex

        term_map: Dict[str, int] = {}
        chunks: List[List] = []      # per unified id: [(docs, weights), ...]
        dfs: List[int] = []

        def uid(term: str) -> int:
            t = term_map.get(term)
            if t is None:
                t = len(term_map)
                term_map[term] = t
                chunks.append([])
                dfs.append(0)
            return t

        for seg in self._segments:
            for term, ordinal in seg.iter_terms():
                t = uid(term)
                docs, weights = seg.get_postings_by_ordinal(ordinal, True)
                chunks[t].append((docs.astype(np.int32),
                                  weights.astype(np.uint8)))
                dfs[t] += int(seg.dfs[ordinal])

        for tid, term in enumerate(self.term_dict.terms):
            p = self.term_dict.postings[tid]
            t = uid(term)
            if p.df == -1:
                dfs[t] = -1
                continue
            if p.df > 0 and len(p.doc_ids):
                chunks[t].append((np.asarray(p.doc_ids, np.int32),
                                  np.asarray(p.weights, np.uint8)))
            if dfs[t] >= 0:
                dfs[t] += p.df

        T = len(term_map)
        lens = np.zeros(T, dtype=np.int64)
        for t in range(T):
            if dfs[t] != -1:
                lens[t] = sum(c[0].size for c in chunks[t])
        offsets = np.zeros(T + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        P = int(offsets[-1])
        docs_arr = np.zeros(P, dtype=np.int32)
        weights_arr = np.zeros(P, dtype=np.uint8)
        for t in range(T):
            if dfs[t] == -1 or not chunks[t]:
                continue
            pos = offsets[t]
            for d, w in chunks[t]:
                docs_arr[pos : pos + d.size] = d
                weights_arr[pos : pos + w.size] = w
                pos += d.size

        terms = [None] * T
        for term, t in term_map.items():
            terms[t] = term
        doc_lengths = np.zeros(max(n_docs, 1), dtype=np.float32)
        np.add.at(doc_lengths, docs_arr[:P], weights_arr[:P].astype(np.float32))
        doc_lengths = doc_lengths[:n_docs]
        avgdl = float(doc_lengths.mean()) if n_docs > 0 else 0.0
        return BuiltIndex(
            terms=terms, term_to_id=dict(term_map),
            term_offsets=offsets, postings_docs=docs_arr,
            postings_weights=weights_arr,
            df=np.asarray(dfs, dtype=np.int32),
            doc_lengths=doc_lengths, avgdl=avgdl, num_docs=n_docs)

    def build_optimized_indexes(self) -> None:
        if self.short_query_index is not None:
            self.short_query_index.freeze()
        if self._try_append_optimized():
            return
        # Coverage tables first: they materialize norm_texts (one
        # normalize pass over the corpus) which the metadata cache and
        # word-df builders reuse — at 1M docs the three independent
        # normalize passes cost ~25s of load/build time.
        self._build_coverage_tables()
        self._build_document_metadata_cache()
        self._build_first_token_index()
        self._derived_doc_epoch = self.documents.mutation_epoch
        self._derived_syn_epoch = (self.synonym_map.mutation_epoch
                                   if self.synonym_map is not None else -1)
        if self._mesh is not None and self.coverage_tables is not None:
            from ..parallel.sharding import ShardedCoverageTables

            self.sharded_tables = ShardedCoverageTables(
                self.coverage_tables, self._mesh)

    def _try_append_optimized(self) -> bool:
        """Derived structures in O(delta) after an append-only finalize:
        coverage tables / norm_texts / metadata / first-token index all
        extend in place. False (→ full rebuild) when anything that can
        rewrite EXISTING rows happened since the last derived build —
        deletions (metadata blanks deleted docs), synonym-map changes
        (canonicalization rewrites texts), mesh serving (sharded tables
        re-shard), or a coverage-table bucket overflow."""
        import os as _os

        ap = self._last_append
        if ap is None or self._mesh is not None:
            return False
        if _os.environ.get("INFIDEX_TPU_APPEND_FINALIZE", "1") == "0":
            return False
        start, k = ap
        ct = self.coverage_tables
        nt = self.norm_texts
        if ct is None or nt is None or nt.size != start:
            return False
        if len(self.doc_metadata) != start:
            return False
        if self.documents.mutation_epoch != self._derived_doc_epoch:
            return False
        syn_epoch = (self.synonym_map.mutation_epoch
                     if self.synonym_map is not None else -1)
        if syn_epoch != self._derived_syn_epoch:
            return False
        if k == 0:
            return True
        delims = (self.tokenizer.tokenizer_setup.delimiters
                  if self.tokenizer.tokenizer_setup else (" ",))
        texts_new = []
        for i in range(start, start + k):
            doc = self.documents.get_document(i)
            if doc is None or not doc.indexed_text:
                texts_new.append("")
                continue
            text = doc.indexed_text
            if self.tokenizer.text_normalizer is not None:
                text = self.tokenizer.text_normalizer.normalize(text)
            if (self.synonym_map is not None
                    and self.synonym_map.has_canonical_mappings):
                text = self.synonym_map.canonicalize_text(text, delims)
            texts_new.append(text.lower())
        if not ct.append_texts(texts_new, delims, start):
            return False
        grown = np.empty(start + k, dtype=object)
        grown[:start] = nt
        grown[start:] = texts_new
        self.norm_texts = grown
        self._append_metadata(texts_new, start)
        if self.first_token_index is not None:
            self.first_token_index.append_docs(texts_new, delims, start)
        return True

    def _append_metadata(self, texts_new, start: int) -> None:
        """Metadata-cache rows for appended docs (same recipe as the
        full ``_build_document_metadata_cache`` use_nt branch)."""
        delims = (
            set(self.tokenizer.tokenizer_setup.delimiters)
            if self.tokenizer.tokenizer_setup
            else {" "}
        )
        for off, text in enumerate(texts_new):
            doc = self.documents.get_document(start + off)
            if doc is None or doc.deleted or not doc.indexed_text:
                self.doc_metadata.append(DocumentMetadata())
                continue
            first = ""
            count = 0
            j, L = 0, len(text)
            while j < L:
                while j < L and text[j] in delims:
                    j += 1
                s0 = j
                while j < L and text[j] not in delims:
                    j += 1
                if j > s0:
                    if count == 0:
                        first = text[s0:j]
                    count += 1
            self.doc_metadata.append(DocumentMetadata(first, count))

    def _build_first_token_index(self) -> None:
        """Per-finalize first-token prior (index/first_token.py): maps a
        word to the docs that START with it — the fusion scorer's
        position-gated top classes for single-word queries."""
        import os as _os

        if _os.environ.get("INFIDEX_TPU_CLASS_PRIOR", "1") == "0":
            self.first_token_index = None
            return
        if self.norm_texts is None:
            self.first_token_index = None
            return
        from .first_token import FirstTokenIndex

        delims = (self.tokenizer.tokenizer_setup.delimiters
                  if self.tokenizer.tokenizer_setup else (" ",))
        self.first_token_index = FirstTokenIndex.build(self.norm_texts,
                                                       delims)

    def enable_sharding(self, mesh) -> None:
        """Serve Stage-1 + coverage sharded over *mesh* from now on.

        The mesh analogue of the reference's per-segment search + merge
        (VectorModel.cs:573-585); index rebuilds re-shard automatically."""
        self._mesh = mesh
        if self.built is not None:
            self._build_sharded_index()
        if self.coverage_tables is not None:
            from ..parallel.sharding import ShardedCoverageTables

            self.sharded_tables = ShardedCoverageTables(
                self.coverage_tables, mesh)

    def disable_sharding(self) -> None:
        self._mesh = None
        self.sharded = None
        self.sharded_tables = None

    def _build_sharded_index(self) -> None:
        from ..parallel.sharding import ShardedDeviceIndex

        self.sharded = ShardedDeviceIndex(
            self.built, self._mesh,
            self.deleted_arr if self.deleted_arr.size else None)

    @property
    def stage1_backend(self):
        """The index image Stage-1 calls should use (mmap mode wins,
        then sharded, then the single-chip device)."""
        if self._mmap_stage1 is not None:
            return self._mmap_stage1
        return self.sharded if self.sharded is not None else self.device

    def _build_coverage_tables(self) -> None:
        """Encode per-doc coverage token tables for the device kernel."""
        from ..ops.coverage_kernel import CoverageTables

        delims = (
            self.tokenizer.tokenizer_setup.delimiters
            if self.tokenizer.tokenizer_setup else (" ",)
        )
        texts = []
        for i in range(len(self.documents)):
            doc = self.documents.get_document(i)
            if doc is None or not doc.indexed_text:
                texts.append("")
                continue
            text = doc.indexed_text
            if self.tokenizer.text_normalizer is not None:
                text = self.tokenizer.text_normalizer.normalize(text)
            if (self.synonym_map is not None
                    and self.synonym_map.has_canonical_mappings):
                text = self.synonym_map.canonicalize_text(text, delims)
            texts.append(text.lower())
        self.coverage_tables = CoverageTables.build(texts, delims)
        # Normalized lowercase texts by internal id, for vectorized
        # candidate-text fetch (LCS inputs) without per-doc Python.
        self.norm_texts = np.empty(len(texts), dtype=object)
        self.norm_texts[:] = texts

    def _build_document_metadata_cache(self) -> None:
        delims = (
            set(self.tokenizer.tokenizer_setup.delimiters)
            if self.tokenizer.tokenizer_setup
            else {" "}
        )
        self.doc_metadata = []
        nt = self.norm_texts
        use_nt = nt is not None and nt.size >= len(self.documents)
        for i in range(len(self.documents)):
            doc = self.documents.get_document(i)
            if doc is None or doc.deleted or not doc.indexed_text:
                self.doc_metadata.append(DocumentMetadata())
                continue
            # same recipe as the coverage tables (normalize -> canonicalize
            # -> lower); reuse their pass when available
            if use_nt:
                text = nt[i]
            else:
                text = self.normalize_doc_text(doc.indexed_text.lower())
            first = ""
            count = 0
            j, L = 0, len(text)
            while j < L:
                while j < L and text[j] in delims:
                    j += 1
                start = j
                while j < L and text[j] not in delims:
                    j += 1
                if j > start:
                    if count == 0:
                        first = text[start:j]
                    count += 1
            self.doc_metadata.append(DocumentMetadata(first, count))

    def _build_word_idf_cache(self, append: Optional[Tuple[int, int]] = None
                              ) -> None:
        """Word-level document frequencies -> idf (VectorModel.cs:864-908).

        ``append=(start, k)``: only the k appended docs are counted into
        the retained df table, then every idf is recomputed (total-docs
        changed) in one vectorized float32 pass — identical values to
        the scalar ``compute_idf`` loop, O(delta + vocab) instead of a
        full corpus tokenization."""
        total = self.documents.count
        if append is not None and self._word_df is not None:
            self._append_word_df(*append)
            self._vectorized_idf_cache(total)
            return
        self.word_idf_cache = {}
        self._word_df = None
        if total == 0:
            return
        word_df = self._native_word_df()
        if word_df is None:
            word_df = {}
            for i in range(len(self.documents)):
                doc = self.documents.get_document(i)
                if doc is None or doc.deleted or not doc.indexed_text:
                    continue
                text = doc.indexed_text.lower()
                if self.tokenizer.text_normalizer is not None:
                    text = self.tokenizer.text_normalizer.normalize(text)
                seen = set()
                for w, _ in self.tokenizer.split_words(text):
                    lw = w.lower()
                    if lw and lw not in seen:
                        seen.add(lw)
                        word_df[lw] = word_df.get(lw, 0) + 1
        self._word_df = word_df
        for w, df in word_df.items():
            if 0 < df <= total:
                self.word_idf_cache[w] = compute_idf(total, df)

    def _append_word_df(self, start: int, k: int) -> None:
        """Count the appended docs' word dfs into the retained table
        (same text recipe as the full python loop above)."""
        wd = self._word_df
        for i in range(start, start + k):
            doc = self.documents.get_document(i)
            if doc is None or doc.deleted or not doc.indexed_text:
                continue
            text = doc.indexed_text.lower()
            if self.tokenizer.text_normalizer is not None:
                text = self.tokenizer.text_normalizer.normalize(text)
            seen = set()
            for w, _ in self.tokenizer.split_words(text):
                lw = w.lower()
                if lw and lw not in seen:
                    seen.add(lw)
                    wd[lw] = wd.get(lw, 0) + 1

    def _vectorized_idf_cache(self, total: int) -> None:
        """word_idf_cache from the retained df table, float32 semantics
        bit-identical to ``compute_idf`` (same op order and dtypes)."""
        if total <= 0 or not self._word_df:
            self.word_idf_cache = {}
            return
        words = list(self._word_df.keys())
        dfs = np.fromiter(self._word_df.values(), np.int64, len(words))
        dfs_f = dfs.astype(np.float32)
        ratio = (np.float32(total) - dfs_f + np.float32(0.5)) / (
            dfs_f + np.float32(0.5))
        idf = np.where(ratio > 0,
                       np.log1p(np.maximum(ratio, np.float32(0.0)),
                                dtype=np.float32), np.float32(0.0))
        ok = (dfs > 0) & (dfs <= total)
        idf_list = idf.tolist()
        self.word_idf_cache = {
            w: v for w, v, good in zip(words, idf_list, ok.tolist()) if good}

    def _native_word_df(self) -> Optional[Dict[str, int]]:
        """Word df via one native pass (same text/skip semantics as the
        Python loop; the final per-word .lower() becomes one text-level
        lower after normalization, which is equivalent)."""
        if self.tokenizer.tokenizer_setup is None:
            return None
        try:
            from ..native.bulk import word_document_frequencies
        except Exception:
            return None
        norm = self.tokenizer.text_normalizer
        # Word df runs on NON-canonicalized text (VectorModel.cs:864-908
        # counts surface words); norm_texts is shareable only when no
        # canonical synonym rewriting is active.
        nt = self.norm_texts
        use_nt = (nt is not None and nt.size >= len(self.documents)
                  and not (self.synonym_map is not None
                           and self.synonym_map.has_canonical_mappings))
        texts, skip = [], []
        for i in range(len(self.documents)):
            doc = self.documents.get_document(i)
            if doc is None or doc.deleted or not doc.indexed_text:
                texts.append("")
                skip.append(1)
                continue
            if use_nt:
                texts.append(nt[i])
            else:
                text = doc.indexed_text.lower()
                if norm is not None:
                    text = norm.normalize(text)
                texts.append(text.lower())
            skip.append(0)
        return word_document_frequencies(
            texts, self.tokenizer.tokenizer_setup.delimiters, skip)

    # ------------------------------------------------------------------
    # Fuzzy LD1 expansion

    def _ensure_ld1_index(self) -> Dict[str, List[int]]:
        """Symmetric-delete LD1 dictionary, extended INCREMENTALLY.

        The vocabulary is append-only across incremental finalizes
        (term ids are stable), so only new terms get variants — a full
        O(vocab x len) rebuild per finalize starves live serving.
        Sample positions guard the append-only assumption: segment-merge
        rebuilds that remap ids trigger a full rebuild. A term that
        becomes a stop term stays in the dictionary; its matches are
        df-gated to zero idf downstream (postings cleared), same result
        as the reference's FST dropping it."""
        built = self.built
        idx = self._ld1_index
        upto = getattr(self, "_ld1_upto", 0)
        samples = getattr(self, "_ld1_samples", ())
        if idx is not None:
            if upto > len(built.terms) or any(
                    built.terms[p] != t for p, t in samples):
                idx = None  # ids remapped: rebuild
        if idx is None:
            idx = {}
            upto = 0
        if upto < len(built.terms):
            df = built.df
            terms = built.terms
            for tid in range(upto, len(terms)):
                term = terms[tid]
                if len(term) < 3 or df[tid] <= 0:
                    continue
                idx.setdefault(term, []).append(tid)
                for v in _delete_variants(term):
                    idx.setdefault(v, []).append(tid)
            upto = len(terms)
        self._ld1_index = idx
        self._ld1_upto = upto
        self._ld1_samples = tuple(
            (p, built.terms[p]) for p in {0, upto // 2, upto - 1}
            if 0 <= p < upto)
        return idx

    # Vocabularies above this size use the MXU signature matmul
    # (ops/fuzzy.py) instead of the host symmetric-delete dictionary,
    # whose build is O(vocab x len) time and memory.
    SIGNATURE_VOCAB_THRESHOLD = 200_000

    def _use_signature_index(self) -> bool:
        return (self.built is not None
                and len(self.built.terms) >= self.SIGNATURE_VOCAB_THRESHOLD)

    def _ensure_sig_index(self):
        if self._sig_index is None:
            from ..ops.fuzzy import NGramSignatureIndex

            self._sig_index = NGramSignatureIndex(
                self.built.terms, self.built.df)
        return self._sig_index

    @staticmethod
    def _ld1_verify(text: str, term: str) -> bool:
        """The exact reference predicate (FstIndex.MatchWithinEditDistance1):
        plain Levenshtein <= 1, no transposition, |len diff| <= 1."""
        return (abs(len(term) - len(text)) <= 1
                and levenshtein(text, term, 1) <= 1)

    @staticmethod
    def _is_adjacent_transposition(a: str, b: str) -> bool:
        """True when b is a with exactly one adjacent pair swapped."""
        if len(a) != len(b) or a == b:
            return False
        n = len(a)
        i = 0
        while i < n and a[i] == b[i]:
            i += 1
        if i >= n - 1:
            return False
        return (a[i] == b[i + 1] and a[i + 1] == b[i]
                and a[i + 2:] == b[i + 2:])

    def _fuzzy_verify(self, text: str, term: str) -> bool:
        """Damerau-LD1: the reference predicate widened with adjacent
        transpositions (a deliberate extension over
        FstIndex.MatchWithinEditDistance1 — transposition typos of words
        beyond the WordMatcher LD1 length gate otherwise have NO
        candidate generator at corpus scale, while the coverage reranker
        already credits them via the Damerau rescue). Disable with
        ``fuzzy_transpositions = False`` for strict reference semantics."""
        if self._ld1_verify(text, term):
            return True
        return (self.fuzzy_transpositions
                and self._is_adjacent_transposition(text, term))

    def prime_fuzzy_cache(self, tokens: List[str]) -> None:
        """Resolve many unknown tokens in ONE device round trip.

        The batch pipeline calls this with every unknown token of a query
        batch before per-query ``prepare_stage1``, so the per-token lookups
        below always hit the LRU when the signature backend is active."""
        misses = [t for t in dict.fromkeys(tokens)
                  if self._fuzzy_cache.get(t) is None]
        if not misses:
            return
        if self._use_signature_index():
            sig = self._ensure_sig_index()
            for tok, matched in zip(misses,
                                    sig.match_batch(misses, self._fuzzy_verify)):
                self._fuzzy_cache.put(tok, matched)
        else:
            for tok in misses:
                self.expand_missing_term_ids(tok)

    def expand_missing_term_ids(self, text: str) -> np.ndarray:
        """LD1-matched vocab term ids for an unknown query token.

        Mirrors FstIndex.MatchWithinEditDistance1 (plain Levenshtein<=1, no
        transposition), capped at 1024 matched ordinals like the reference
        FST traversal. The posting union/df/idf of the virtual term is
        computed downstream (on device for the batch path)."""
        cached = self._fuzzy_cache.get(text)
        if cached is not None:
            return cached

        if self._use_signature_index():
            sig = self._ensure_sig_index()
            result = sig.match_batch([text], self._ld1_verify)[0]
            self._fuzzy_cache.put(text, result)
            return result

        ld1 = self._ensure_ld1_index()
        cand_ids = set()
        for v in [text] + _delete_variants(text):
            for tid in ld1.get(v, ()):  # delete-variant candidates
                cand_ids.add(tid)

        matched: List[int] = []
        for tid in cand_ids:
            if self._fuzzy_verify(text, self.built.terms[tid]):
                matched.append(tid)
        result = np.asarray(sorted(matched)[:1024], dtype=np.int64)
        self._fuzzy_cache.put(text, result)
        return result

    def expand_missing_term(self, text: str) -> Optional[Tuple[np.ndarray, int]]:
        """LD1 union over the vocabulary -> (doc_ids, df) virtual term.

        Host materialization of the RoaringBitmap union
        (VectorModel.cs:643-743); the batch serving path ships term ids
        instead and unions on device (DeviceIndex.search_batch)."""
        matched = self.expand_missing_term_ids(text)
        if matched.size == 0:
            return None
        built = self.built
        chunks = [built.postings_for(int(t))[0] for t in matched]
        union = np.unique(np.concatenate(chunks)) if chunks else \
            np.zeros(0, np.int32)
        return (union.astype(np.int32), int(union.size))

    # ------------------------------------------------------------------
    # Search

    def prepare_stage1(self, query_text: str):
        """Host half of Stage-1: tokenize, look up terms, expand fuzzies.

        Returns (term_ids, idfs, fuzzy_groups) ready for
        ``DeviceIndex.search_batch`` (fuzzy_groups: one matched-term-id
        array per unknown token; union/df/idf resolve on device), or None
        when the query resolves to nothing scoreable.
        """
        if self.built is None:
            self.build_inverted_lists()
        built = self.built
        total_docs = self.documents.count
        if total_docs == 0:
            return None

        tokens = self.tokenizer.tokenize_for_search(query_text)
        if not tokens:
            return None

        # Dedupe tokens into unique query terms (occurrences tracked but not
        # used by BM25 scoring — matches Bm25Scorer which scores unique terms).
        seen: Dict[str, int] = {}
        unique_tokens: List[str] = []
        for t in tokens:
            if t not in seen:
                seen[t] = 1
                unique_tokens.append(t)
            else:
                seen[t] += 1

        term_ids: List[int] = []
        idfs: List[float] = []
        fuzzy_groups: List[np.ndarray] = []

        for tok in unique_tokens:
            tid = built.term_to_id.get(tok, -1)
            df = built.df[tid] if tid >= 0 else 0
            if df <= 0 and len(tok) >= 4:
                matched = self.expand_missing_term_ids(tok)
                if matched.size:
                    fuzzy_groups.append(matched)
                continue
            if df <= 0 or df > self.stop_term_limit:
                continue
            term_ids.append(tid)
            idfs.append(compute_idf(total_docs, int(df)))

        if not term_ids and not fuzzy_groups:
            return None

        return (np.asarray(term_ids, dtype=np.int64),
                np.asarray(idfs, dtype=np.float32),
                fuzzy_groups)

    def finish_stage1_arrays(self, scores: np.ndarray,
                             ids: np.ndarray) -> Stage1Arrays:
        """Vectorized ``finish_stage1`` for the 1:1 id<->key fast path.

        Equivalent to the entry-building loop: cut at the first
        non-positive score (top-k rows are score-descending), drop deleted
        docs, map internal ids to public keys. Skips the best-segments map
        (no segments exist on this path, so it would never be consulted).
        """
        nonpos = scores <= 0.0
        n = int(np.argmax(nonpos)) if nonpos.any() else int(scores.size)
        scores = scores[:n]
        iids = ids[:n].astype(np.int64)
        live = ~self.deleted_arr[iids]
        if not live.all():
            scores, iids = scores[live], iids[live]
        return Stage1Arrays(np.asarray(scores, np.float32), iids,
                            self.doc_keys_arr[iids])

    def finish_stage1(
        self,
        scores: np.ndarray,
        ids: np.ndarray,
        best_segments_map: Optional[Dict[int, int]] = None,
    ) -> List[ScoreEntry]:
        """Host half of Stage-1 after the device top-k: resolve documents,
        drop deleted, fill the best-segments map."""
        entries: List[ScoreEntry] = []
        for s, i in zip(scores.tolist(), ids.tolist()):
            if s <= 0.0:
                break  # top_k is sorted desc; first zero ends matches
            doc = self.documents.get_document(int(i))
            if doc is None or doc.deleted:
                continue
            entries.append(ScoreEntry(float(s), doc.document_key))
            if best_segments_map is not None:
                base = int(i) - doc.segment_number
                if base >= 0:
                    prev = best_segments_map.get(base)
                    if prev is None or s > prev[0]:
                        best_segments_map[base] = (float(s), doc.segment_number)
        return entries

    def _tier_gate(self, prep) -> bool:
        """Cheap df-only routing check (no postings touched).

        Also predicts the tier's own union-route conditions (single live
        term / missing term / typo-suspect df — TieredCandidateSelector
        .select's disjunction cases): such queries would come back as
        tier fallbacks and pay a SECOND, serialized device round trip
        (~190ms on the tunnel), so they go straight into the main
        batched device group instead."""
        term_ids, _idfs, fuzzy_groups = prep
        from .candidates import TIER_LANE_BUDGET, TYPO_SUSPECT_DF

        if (TIER_LANE_BUDGET <= 0 or len(term_ids) < 2 or fuzzy_groups
                or self.built is None or self._mmap_stage1 is not None):
            return False
        dfs = self.built.df[np.asarray(term_ids, dtype=np.int64)]
        if int(dfs.min()) < TYPO_SUSPECT_DF:
            # Only the typo-suspect (0 < df < 10) condition is live here:
            # prepare_stage1 never emits term_ids with df <= 0 (unknown
            # tokens become fuzzy_groups or are dropped). Routing these
            # to the main device group means large-lane typo-suspect
            # queries score on champion-clipped lanes at batch sizes
            # above HOST_S1_MAX_BATCH instead of the exact host scorer —
            # an intentional trade (one shared device call vs a second
            # serialized round trip); recall across modes is pinned by
            # scripts/recall_study.py.
            return False
        lanes = int(dfs.sum())
        return lanes > TIER_LANE_BUDGET

    #: device pool scoring: OFF by default. The binary-search join of
    #: ``_pool_score_kernel`` costs B x Pp x log2(P) x t_pad random HBM
    #: gathers over the full CSR; traced on the real chip (2026-08-19,
    #: scripts' trace300k) it added ~10s per 64-batch at 300k docs —
    #: ~80x the ~1.3ms/query native host scorer it replaced, and the
    #: whole difference between 8 QPS and the healthy steady state. The
    #: host scorer runs on the prefetch pool overlapped with the device
    #: wait, so it is effectively free until the host binds. "1" forces
    #: the device path (bit-identical results, tests/test_pool_device.py).
    POOL_DEVICE = __import__("os").environ.get("INFIDEX_TPU_POOL_DEVICE",
                                               "0")

    def device_pool_scoring_ok(self) -> bool:
        """True when batch tier queries should leave pool scoring to the
        device (``DeviceIndex.pool_score_dispatch``)."""
        if self.POOL_DEVICE in ("0", "off", "false", "auto"):
            return False
        if self.device is None or self.sharded is not None:
            return False
        return True

    def stage1_tier_select(self, prep, top_k: int, mask=None):
        """Batch-path tier routing: returns
        ``("scored", scores, ids, lim)`` (host-scored),
        ``("pool", pool, term_ids, idfs, lim)`` (device scores the pool),
        or None (ride the dense device disjunction)."""
        term_ids, idfs, fuzzy_groups = prep
        tiered = self._tiered_for()
        if tiered is None or not tiered.applicable(term_ids, fuzzy_groups):
            return None
        if not self.device_pool_scoring_ok():
            out = tiered.run(term_ids, idfs, top_k, mask=mask)
            if out is None:
                return None
            return ("scored",) + out
        sel = tiered.select_pool(term_ids, idfs, top_k, mask=mask)
        if sel is None:
            return None
        pool, lim = sel
        return "pool", pool, term_ids, idfs, lim

    def _tiered_for(self):
        if self.built is None or self._mmap_stage1 is not None:
            return None
        if self._tiered_stage1 is None:
            from .candidates import TieredStage1

            self._tiered_stage1 = TieredStage1(self.built, self.deleted_arr)
        self._tiered_stage1.deleted_arr = self.deleted_arr
        return self._tiered_stage1

    def stage1_tiered_maybe(self, prep, top_k: int, mask=None):
        """Host tiered Stage-1 (index/candidates.py) when the query's lane
        count makes the dense device scatter the slower option; returns
        (scores, ids) in the device output convention, or None to route
        the query to the device kernel. ``mask`` (pre-filter) intersects
        the pool; a pool the mask shrinks below top_k routes to the
        device, whose masked full disjunction is exact."""
        term_ids, idfs, fuzzy_groups = prep
        tiered = self._tiered_for()
        if tiered is None or not tiered.applicable(term_ids, fuzzy_groups):
            return None
        return tiered.run(term_ids, idfs, top_k, mask=mask)

    #: lane/batch ceilings for routing Stage-1 to the exact host scorer
    #: (single-query serving: a host pass over <=64k postings costs ~1ms
    #: while the device call pays the full link round trip, ~30ms on the
    #: tunnel). 0 disables host routing.
    #: kept at/below the champion-clipping threshold so no clipped term
    #: can route here — host scoring then matches the device lanes
    #: exactly (single-query vs batched results stay consistent).
    # Measured at 300k docs: the host scatter runs 4ms at 65k lanes and
    # 8ms at 260k — far under the ~30ms tunneled-device round trip, so
    # single/double queries stay on host well past the old 32k limit.
    # Re-measured at 1M (scripts/p50_lab.py, round 5): host-forced wins
    # at EVERY observed lane bucket — p50 58.9ms at ≤1.05M lanes vs
    # 69.7ms device-routed — so the cap covers the whole 1M-doc
    # workload with 2x headroom (beyond ~2M lanes is extrapolation;
    # the cap still protects the tail).
    HOST_S1_MAX_LANES = int(__import__("os").environ.get(
        "INFIDEX_TPU_HOST_S1_LANES", "2097152"))
    HOST_S1_MAX_BATCH = int(__import__("os").environ.get(
        "INFIDEX_TPU_HOST_S1_BATCH", "2"))

    @property
    def host_stage1(self):
        """Exact host Stage-1 (index/mmap_serving.MmapStage1 over the
        unified CSR; no segments) for low-lane, low-batch queries."""
        if self._host_stage1 is None:
            from .mmap_serving import MmapStage1

            self._host_stage1 = MmapStage1(self)
        return self._host_stage1

    def host_stage1_ok(self, preps, n_queries: int,
                       max_batch: Optional[int] = None) -> bool:
        """True when the whole (tiny) batch should score on the host:
        fewer queries than the link-latency break-even and a raw lane
        total small enough that numpy scatter beats the ~30ms round trip.
        Host scoring uses FULL postings (no champion clipping) — exact,
        never worse than the device path. ``max_batch`` overrides the
        batch cap for callers whose alternative is a dedicated,
        serialized device round trip (tier-fallback stragglers) rather
        than a shared one."""
        if (self.HOST_S1_MAX_LANES <= 0
                or n_queries > (max_batch if max_batch is not None
                                else self.HOST_S1_MAX_BATCH)
                or self._mmap_stage1 is not None
                or self.sharded is not None
                or self.built is None):
            return False
        df = self.built.df
        lanes = 0
        for term_ids, _idf, fuzzy_groups in preps:
            ids = np.asarray(term_ids, np.int64)
            if ids.size:
                lanes += int(np.maximum(df[ids], 0).sum())
            for grp in (fuzzy_groups or ()):
                g = np.asarray(grp, np.int64)
                if g.size:
                    lanes += int(np.maximum(df[g], 0).sum())
            if lanes > self.HOST_S1_MAX_LANES:
                return False
        return True

    def stage1_live_override(self, mask):
        """Device live-mask buffer for a pre-filter mask (single-chip
        path only; the sharded path post-filters)."""
        if mask is None or self.device is None or self.sharded is not None:
            return None
        return self.device.masked_live(mask)

    def search(
        self,
        query_text: str,
        top_k: int,
        best_segments_map: Optional[Dict[int, int]] = None,
        prefilter_mask=None,
        lim_out: Optional[list] = None,
    ) -> List[ScoreEntry]:
        """Stage-1 BM25 search; returns entries sorted desc (score, -key).
        ``lim_out``, when a list, receives the low-id matcher ids
        (device.py LIM rows) for the coverage candidate budget."""
        prep = self.prepare_stage1(query_text)
        if prep is None:
            return []
        out = self.stage1_tiered_maybe(prep, top_k, mask=prefilter_mask)
        if out is None and self.host_stage1_ok([prep], 1):
            out = self.host_stage1.search_batch(
                [prep], top_k, total_docs=self.documents.count,
                stop_term_limit=self.stop_term_limit,
                host_mask=prefilter_mask)[0]
        if out is None:
            if self.device is None:
                self.build_inverted_lists()
            out = self.stage1_backend.search_batch(
                [prep], top_k, total_docs=self.documents.count,
                stop_term_limit=self.stop_term_limit,
                live_override=self.stage1_live_override(prefilter_mask))[0]
        scores, ids = out[0], out[1]
        if lim_out is not None and len(out) > 2:
            lim_out.append(out[2])
        return self.finish_stage1(scores, ids, best_segments_map)
