"""Search pipeline orchestration: Stage 1 -> consolidate -> Stage 2/3.

Behavioral reference: Infidex ``Scoring/SearchPipeline.cs``:

* Short query = text of len <= 3 with no delimiter (:23, :110-113); the
  1-char path uses champion lists then a full scan; 2-3 char path uses the
  padded-prefix search.
* Coverage is gated: needs a coverage engine + setup, n-gram-capable query
  (any word >= min n-gram size) or an allowed short query (matching docs
  <= 500) (:110-169); empty coverage results fall back to Stage-1 (:184-197).
* Coverage stage (:298-447): candidates = WordMatcher hits partitioned into
  overlapping-with-TFIDF (always processed) and unique (up to
  coverage_depth - overlap), then the TF-IDF top-K (processed with
  normalized-BM25 base score); per candidate LCS memoized; FusionScorer
  produces (score, tiebreaker) into a top-K; truncation index applied.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..coverage.engine import CoverageEngine
from ..coverage.setup import CoverageSetup
from ..index.vector_model import ScoreEntry, VectorModel
from ..index.word_matcher import WordMatcher
from . import short_query as sq
from .fusion import fusion_calculate
from .segment_processor import (calculate_lcs, consolidate_segments,
                                get_best_segment_text)

SHORT_QUERY_MAX_LENGTH = 3
SHORT_QUERY_COVERAGE_DOC_CAP = 500
INT_MAX = 2**31 - 1

# Candidate-count threshold above which Stage 2/3 runs as the batched device
# kernel (below it, per-candidate host scoring has lower latency).
DEVICE_COVERAGE_MIN_CANDIDATES = 24


# Fixed device-coverage batch size: one compiled program regardless of the
# candidate count (larger worklists run in chunks; each candidate is
# independent so chunking is exact).
DEVICE_COVERAGE_CHUNK = 512


def analyze_query(search_text: str, tokenizer) -> Tuple[bool, bool, str]:
    """QueryAnalyzer.Analyze: (can_use_ngrams, has_mixed_terms, long_words_text)."""
    min_size = tokenizer.min_index_size
    setup = tokenizer.tokenizer_setup
    if setup is None:
        return len(search_text) >= min_size, False, search_text
    words = [w for w, _ in tokenizer.split_words(search_text)]
    if not words:
        return len(search_text) >= min_size, False, search_text
    long_words = [w for w in words if len(w) >= min_size]
    short_count = len(words) - len(long_words)
    can_use = bool(long_words)
    long_text = " ".join(long_words) if long_words else search_text
    has_mixed = short_count > 0 and bool(long_words)
    return can_use, has_mixed, long_text


class SearchPipeline:
    def __init__(
        self,
        vector_model: VectorModel,
        coverage_engine: Optional[CoverageEngine],
        coverage_setup: Optional[CoverageSetup],
        word_matcher: Optional[WordMatcher],
        synonym_map=None,
    ):
        self._model = vector_model
        self._coverage_engine = coverage_engine
        self._coverage_setup = coverage_setup
        self._word_matcher = word_matcher
        self._synonym_map = synonym_map
        self._sorted_vocab = None

        if self._coverage_engine is not None:
            self._rewire_coverage()

    def _rewire_coverage(self) -> None:
        m = self._model
        self._coverage_engine.set_corpus_statistics(
            m.built,
            m.built.df if m.built is not None else None,
            m.documents.count,
        )
        self._coverage_engine.set_document_metadata_cache(m.doc_metadata)
        self._coverage_engine.set_word_idf_cache(m.word_idf_cache)

    def invalidate_caches(self) -> None:
        self._sorted_vocab = None
        if self._coverage_engine is not None:
            self._rewire_coverage()

    def _vocab(self):
        if self._sorted_vocab is None:
            self._sorted_vocab = sq._SortedVocab(self._model)
        return self._sorted_vocab

    # ------------------------------------------------------------------
    def execute(self, search_text: str, coverage_setup: Optional[CoverageSetup],
                coverage_depth: int, max_results: int = INT_MAX) -> List[ScoreEntry]:
        if not search_text or search_text.isspace():
            return []

        if self._model.tokenizer.text_normalizer is not None:
            search_text = self._model.tokenizer.text_normalizer.normalize(search_text)

        best_segments_map: Dict[int, Tuple[float, int]] = {}

        stage1_entries = self._execute_relevancy_stage(
            search_text, best_segments_map, coverage_depth, max_results)
        stage1_results = consolidate_segments(stage1_entries)

        delims = (self._model.tokenizer.tokenizer_setup.delimiter_set
                  if self._model.tokenizer.tokenizer_setup else {" "})
        is_short_query = (0 < len(search_text) <= SHORT_QUERY_MAX_LENGTH
                          and not any(d in search_text for d in delims))

        if is_short_query and len(stage1_results) >= max_results and max_results < INT_MAX:
            return stage1_results[:max_results]

        short_doc_count = 0
        short_count_known = False
        if is_short_query and self._model.short_query_index is not None:
            short_doc_count = self._model.short_query_index.count_documents(search_text)
            short_count_known = True
        elif is_short_query:
            short_doc_count = sq.count_short_query_documents(
                search_text, self._model, self._vocab())
            short_count_known = True

        can_use_ngrams, _, _ = analyze_query(search_text, self._model.tokenizer)
        allow_short_coverage = (is_short_query and short_count_known
                                and 0 < short_doc_count <= SHORT_QUERY_COVERAGE_DOC_CAP)
        skip_due_to_cap = (is_short_query and short_count_known
                           and short_doc_count > SHORT_QUERY_COVERAGE_DOC_CAP)

        if (self._coverage_engine is None or coverage_setup is None
                or (not can_use_ngrams and not allow_short_coverage)
                or skip_due_to_cap):
            return stage1_results

        coverage_results = self._execute_coverage_stage(
            search_text, coverage_setup, coverage_depth, max_results,
            stage1_results, best_segments_map)

        if not coverage_results and stage1_results:
            return stage1_results
        return coverage_results

    # ------------------------------------------------------------------
    def _execute_relevancy_stage(self, search_text: str,
                                 best_segments_map, coverage_depth: int,
                                 max_results: int) -> List[ScoreEntry]:
        can_use_ngrams, has_mixed, long_words_text = analyze_query(
            search_text, self._model.tokenizer)

        if not can_use_ngrams:
            if len(search_text) == 1:
                ch = search_text[0].lower()
                if (self._model.short_query_resolver is not None
                        and max_results < INT_MAX):
                    ok, champions = self._model.short_query_resolver.try_get_champions(
                        ch, max_results)
                    if ok:
                        return champions
                return sq.search_single_character(
                    ch, self._model, max_results, best_segments_map)
            return sq.search_short_query(
                search_text.lower(), self._model, best_segments_map, self._vocab())

        tfidf_query = long_words_text if has_mixed else search_text
        if not tfidf_query or tfidf_query.isspace():
            tfidf_query = search_text
        return self._model.search(tfidf_query, coverage_depth, best_segments_map)

    # ------------------------------------------------------------------
    def _execute_coverage_stage(self, search_text: str, coverage_setup: CoverageSetup,
                                coverage_depth: int, max_results: int,
                                top_candidates: List[ScoreEntry],
                                best_segments_map) -> List[ScoreEntry]:
        model = self._model
        if len(top_candidates) > coverage_depth:
            top_candidates = top_candidates[:coverage_depth]

        if coverage_setup.enable_lexical_prescreen and top_candidates:
            top_candidates = self._lexical_prescreen(search_text, top_candidates, coverage_setup)

        wm_ids = np.zeros(0, dtype=np.int32)
        if self._word_matcher is not None:
            wm_ids = self._word_matcher.lookup_query(
                search_text, coverage_setup.cover_prefix_suffix)

        # Key index for LCS/word-hit memoization
        unique_keys: Set[int] = {c.document_id for c in top_candidates}
        for internal_id in wm_ids.tolist():
            doc = model.documents.get_document(internal_id)
            if doc is not None and not doc.deleted:
                unique_keys.add(doc.document_key)
        key_to_index = {k: i for i, k in enumerate(unique_keys)}
        lcs_memo: Dict[int, int] = {}
        word_hits_memo: Dict[int, int] = {}

        context = self._coverage_engine.prepare_query(search_text)

        tfidf_internal: Set[int] = set()
        for c in top_candidates:
            doc = model.documents.get_document_by_public_key(c.document_id)
            if doc is not None:
                tfidf_internal.add(doc.id)

        wm_overlapping = [i for i in wm_ids.tolist() if i in tfidf_internal]
        wm_unique = [i for i in wm_ids.tolist() if i not in tfidf_internal]
        wm_limit = max(0, coverage_depth - len(wm_overlapping))

        final_scores: List[ScoreEntry] = []
        max_word_hits = 0
        min_stem = model.tokenizer.min_index_size

        def best_segment_doc(doc):
            if best_segments_map:
                segs = model.documents.get_documents_for_public_key(doc.document_key)
                if segs:
                    base = segs[0].id - segs[0].segment_number
                    entry = best_segments_map.get(base)
                    if entry is not None:
                        best = model.documents.get_document_of_segment(
                            doc.document_key, entry[1])
                        if best is not None:
                            return best
            return doc

        def lcs_for(idx: int, query: str, doc_text: str) -> int:
            lcs_val = lcs_memo.get(idx, 0)
            if lcs_val == 0:
                tolerance = 0
                if len(query) >= coverage_setup.coverage_q_limit_for_error_tolerance:
                    tolerance = int(len(query)
                                    * coverage_setup.coverage_lcs_error_tolerance_relative_q)
                lcs_val = calculate_lcs(query, doc_text, tolerance)
                lcs_memo[idx] = min(lcs_val, 255)
            return lcs_memo[idx]

        def process(internal_id: int, base_score: float) -> None:
            nonlocal max_word_hits
            doc = model.documents.get_document(internal_id)
            if doc is None or doc.deleted:
                return
            idx = key_to_index.get(doc.document_key)
            if idx is None:
                return
            doc_text = get_best_segment_text(
                doc, best_segments_map, model.documents,
                model.tokenizer.text_normalizer)
            coverage_doc_text = doc_text
            if (self._synonym_map is not None
                    and self._synonym_map.has_canonical_mappings
                    and model.tokenizer.tokenizer_setup is not None):
                coverage_doc_text = self._synonym_map.canonicalize_text(
                    coverage_doc_text, model.tokenizer.tokenizer_setup.delimiters)

            lcs_val = lcs_for(idx, context.query, coverage_doc_text)

            features = self._coverage_engine.calculate_features(
                context, coverage_doc_text, lcs_val, internal_id)
            score, tiebreaker = fusion_calculate(
                context.query, coverage_doc_text, features, base_score, min_stem)

            if word_hits_memo.get(idx, 0) == 0:
                word_hits_memo[idx] = min(features.word_hits, 255)
            max_word_hits = max(max_word_hits, features.word_hits)
            final_scores.append(ScoreEntry(score, doc.document_key, tiebreaker))

        # Build the full candidate worklist (order matters for heap ties)
        worklist: List[Tuple[int, float]] = [
            (iid, 0.0) for iid in wm_overlapping
        ] + [(iid, 0.0) for iid in wm_unique[:wm_limit]]
        max_tfidf = top_candidates[0].score if top_candidates else 1.0
        for candidate in top_candidates:
            doc = model.documents.get_document_by_public_key(candidate.document_id)
            if doc is None or doc.deleted:
                continue
            norm_bm25 = candidate.score / max_tfidf if max_tfidf > 0 else 0.0
            worklist.append((doc.id, norm_bm25))

        handled = False
        if (model.coverage_tables is not None
                and len(worklist) >= DEVICE_COVERAGE_MIN_CANDIDATES):
            device_result = self._device_coverage(
                worklist, context, coverage_setup, best_segments_map,
                key_to_index, lcs_memo, word_hits_memo, lcs_for,
                best_segment_doc, final_scores)
            if device_result is not None:
                max_word_hits, leftovers = device_result
                for internal_id, base_score in leftovers:
                    process(internal_id, base_score)
                handled = True

        if not handled:
            for internal_id, base_score in worklist:
                process(internal_id, base_score)

        if max_word_hits == 0 and wm_ids.size == 0:
            return []

        # Keep top coverage_depth (TopKHeap semantics) then consolidate.
        final_scores.sort(key=lambda e: e.sort_key())
        final_results = consolidate_segments(final_scores[: coverage_depth])

        truncation_index = -1
        if coverage_setup.truncate and final_results:
            truncation_index = self._truncation_index(
                final_results, max_word_hits, lcs_memo, word_hits_memo,
                key_to_index, coverage_setup)

        if truncation_index == -1 or not coverage_setup.truncate:
            result_count = max_results
        else:
            result_count = min(max(0, truncation_index) + 1, max_results)
        return final_results[:result_count]

    # ------------------------------------------------------------------
    def _device_coverage(self, worklist, context, coverage_setup,
                         best_segments_map, key_to_index, lcs_memo,
                         word_hits_memo, lcs_for, best_segment_doc,
                         final_scores) -> Optional[Tuple[int, List]]:
        """Score the candidate worklist with the batched device kernel.

        Returns (max_word_hits, leftover_candidates) or None when the query
        shape is ineligible (too many / too long tokens) and the host oracle
        should handle everything.
        """
        from ..coverage.engine import tokenize_slices
        from ..ops.coverage_kernel import (CoverageConfig, FQ_MAX, L_MAX,
                                           Q_MAX, coverage_fusion_batch,
                                           encode_query_tokens)

        model = self._model
        tables = model.coverage_tables
        delims = (model.tokenizer.tokenizer_setup.delimiter_set
                  if model.tokenizer.tokenizer_setup else {" "})

        if context.q_count == 0 or context.q_count > Q_MAX:
            return None
        q_chars, q_rev, q_lens, _, q_count, q_ovf = encode_query_tokens(
            context.query_tokens, Q_MAX)
        fusion_tokens = tokenize_slices(context.query, 0, delims)
        fq_chars, fq_rev, fq_lens, _, fq_count, fq_ovf = encode_query_tokens(
            fusion_tokens, FQ_MAX)
        if q_ovf or fq_ovf:
            return None

        order = sorted(range(q_count), key=lambda i: -q_lens[i])
        q_sorted = np.full(Q_MAX, q_count, dtype=np.int32)
        q_sorted[: len(order)] = order
        q_idf = np.zeros(Q_MAX, np.float32)
        q_idf[:q_count] = context.term_idf[:q_count]
        q_widf = np.zeros(Q_MAX, np.float32)
        if context.word_level_idf is not None:
            q_widf[:q_count] = context.word_level_idf[:q_count]
        last_alpha = bool(fusion_tokens
                          and len(fusion_tokens[-1].lower) == 1
                          and fusion_tokens[-1].lower.isalpha())

        # Resolve candidates -> (text_id, base, idx, key); split off leftovers
        device_cands = []   # (text_id, base_score, idx, doc_key)
        leftovers = []
        for internal_id, base_score in worklist:
            doc = model.documents.get_document(internal_id)
            if doc is None or doc.deleted:
                continue
            idx = key_to_index.get(doc.document_key)
            if idx is None:
                continue
            text_doc = best_segment_doc(doc)
            if (text_doc.id != doc.id or tables.overflow[text_doc.id]):
                leftovers.append((internal_id, base_score))
                continue
            doc_text = get_best_segment_text(
                doc, best_segments_map, model.documents,
                model.tokenizer.text_normalizer)
            if (self._synonym_map is not None
                    and self._synonym_map.has_canonical_mappings
                    and model.tokenizer.tokenizer_setup is not None):
                doc_text = self._synonym_map.canonicalize_text(
                    doc_text, model.tokenizer.tokenizer_setup.delimiters)
            lcs_val = lcs_for(idx, context.query, doc_text)
            device_cands.append(
                (text_doc.id, base_score, idx, doc.document_key, lcs_val))

        if not device_cands:
            return 0, leftovers

        import jax

        config = CoverageConfig.from_setup(coverage_setup)
        max_word_hits = 0
        for chunk_start in range(0, len(device_cands), DEVICE_COVERAGE_CHUNK):
            chunk = device_cands[chunk_start : chunk_start + DEVICE_COVERAGE_CHUNK]
            c_pad = DEVICE_COVERAGE_CHUNK
            text_ids = np.zeros(c_pad, np.int32)
            base = np.zeros(c_pad, np.float32)
            lcs_arr = np.zeros(c_pad, np.float32)
            for i, (tid, b, idx, key, lcs_val) in enumerate(chunk):
                text_ids[i] = tid
                base[i] = b
                lcs_arr[i] = lcs_val

            out = coverage_fusion_batch(
                tables.word_chars, tables.word_chars_rev, tables.word_lens,
                tables.doc_tokens, tables.doc_tok_offsets,
                tables.doc_tok_count, tables.doc_adj_ws, tables.doc_text_len,
                text_ids, q_chars, q_rev, q_lens, q_idf, q_widf,
                np.int32(q_count), q_sorted, fq_chars, fq_rev, fq_lens,
                np.int32(fq_count), np.bool_(last_alpha), lcs_arr, base,
                np.int32(len(context.query)), config=config)
            # Single round-trip readback (high-latency links).
            score, tie, wh = jax.device_get(out)

            for i, (tid, b, idx, key, lcs_val) in enumerate(chunk):
                hits = int(wh[i])
                if word_hits_memo.get(idx, 0) == 0:
                    word_hits_memo[idx] = min(hits, 255)
                max_word_hits = max(max_word_hits, hits)
                final_scores.append(
                    ScoreEntry(float(score[i]), key, int(tie[i])))
        return max_word_hits, leftovers

    # ------------------------------------------------------------------
    def _truncation_index(self, results: List[ScoreEntry], max_word_hits: int,
                          lcs_memo: Dict[int, int], word_hits_memo: Dict[int, int],
                          key_to_index: Dict[int, int],
                          setup: CoverageSetup) -> int:
        """ResultProcessor.CalculateTruncationIndex (:146-178)."""
        if not results:
            return -1
        min_word_hits = max(setup.coverage_min_word_hits_abs,
                            max_word_hits - setup.coverage_min_word_hits_relative)
        for i in range(len(results) - 1, -1, -1):
            idx = key_to_index.get(results[i].document_id)
            if idx is None:
                continue
            word_hits = word_hits_memo.get(idx, 0)
            lcs_val = lcs_memo.get(idx, 0)
            if (word_hits >= min_word_hits or lcs_val > 0
                    or results[i].score >= setup.truncation_score):
                return i
        return -1

    # ------------------------------------------------------------------
    def _lexical_prescreen(self, search_text: str, candidates: List[ScoreEntry],
                           setup: CoverageSetup) -> List[ScoreEntry]:
        """Scoring/LexicalPrescreen.cs — drop candidates containing no query
        token; skipped if any token is unknown (possible typo)."""
        model = self._model
        tokens = model.tokenizer.word_tokens_for_coverage(
            search_text, setup.min_word_size)
        if not tokens:
            return candidates
        built = model.built
        for token in tokens:
            tid = built.term_to_id.get(token, -1)
            if tid < 0 or built.df[tid] == 0:
                return candidates
        docs_with_any: Set[int] = set()
        for token in tokens:
            tid = built.term_to_id.get(token, -1)
            if tid >= 0 and built.df[tid] > 0:
                docs_with_any.update(built.postings_for(tid)[0].tolist())
        if not docs_with_any:
            return candidates
        filtered = []
        for c in candidates:
            doc = model.documents.get_document_by_public_key(c.document_id)
            if doc is None or doc.deleted:
                continue
            if doc.id in docs_with_any:
                filtered.append(c)
        return filtered if filtered else candidates
