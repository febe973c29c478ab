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
from ..index.vector_model import ScoreEntry, Stage1Arrays, VectorModel
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


def _expired(deadline) -> bool:
    """True when the query deadline (perf_counter seconds) has passed."""
    if deadline is None:
        return False
    import time as _time

    return _time.perf_counter() > deadline


def _job_expired(job: dict) -> bool:
    """Deadline check for one coverage job; flags the query's status dict
    (engine surfaces it as Result.DidTimeOut) on first expiry."""
    if not _expired(job.get("deadline")):
        return False
    st = job.get("status")
    if st is not None:
        st["timed_out"] = True
    return True


# Device-coverage chunk capacity. Each kernel call pays a ~35ms round-trip
# floor on tunneled TPUs and transfers move at ~40MB/s, while the actual
# kernel compute is essentially free (measured: 8 chained edit-distance
# sweeps at C=4096 cost the same as x+1). Cost model per chunk call:
#   35ms + 16B/candidate / 40MB/s  ->  big chunks amortize the floor.
# Partial chunks pad to the next quadrupling bucket so small calls stay
# cheap; override with INFIDEX_TPU_COVERAGE_CHUNK.
import os as _os

DEVICE_COVERAGE_CHUNK = int(_os.environ.get("INFIDEX_TPU_COVERAGE_CHUNK",
                                            "131072"))

# Additive candidate-budget reserve for the [class-prior, WordMatcher
# heads, low-id matchers] chain. The reference's wm budget is
# coverage_depth - |stage1 overlap| (SearchPipeline.cs:298-447), which
# collapses to ZERO whenever Stage-1's candidates all lie in the WM union
# (every exact-word query) — starving the prior classes that hold the
# fusion winners. The reserve is depth-independent, so oracle (deep)
# candidate sets still nest production ones.
DEPTH_RESERVE = int(_os.environ.get("INFIDEX_TPU_DEPTH_RESERVE", "256"))
#: additive candidate slice for the token-conjunctive pool (its own
#: budget — see _assemble_prior).
CONJ_TAKE = int(_os.environ.get("INFIDEX_TPU_CONJ_TAKE", "512"))
#: guaranteed candidate slices for the WordMatcher heads and the low-id
#: matcher tail: the class prior can fill the whole depth budget at
#: scale (a single-word query whose first-token fuzzy class is huge),
#: silently dropping WordMatcher-only and LIM-only docs (measured at 1M:
#: an oracle #0 at WordMatcher-part rank 28 went un-scored).
WM_TAKE_MIN = int(_os.environ.get("INFIDEX_TPU_WM_TAKE_MIN", "256"))
LIM_TAKE_MIN = int(_os.environ.get("INFIDEX_TPU_LIM_TAKE_MIN", "128"))
DEVICE_COVERAGE_CHUNK_MIN = 2048

# Single-query (interactive) threshold: one query's coverage wave is a
# single ~500-1300-candidate chunk whose device call pays the full link
# round trip (~28ms on the tunnel) while the host oracle scores the same
# candidates bit-identically in a few ms — so a LONE coverage job stays
# on the host until it is large enough for the kernel to win even with
# the link floor. Batched serving is unaffected (more than one job).
DEVICE_COVERAGE_MIN_SINGLE = int(_os.environ.get(
    "INFIDEX_TPU_COVERAGE_MIN_SINGLE", "6144"))


def _chunk_sizes(n: int):
    """Greedy power-of-two dispatch plan for ``n`` candidate rows.

    Pad rows cost REAL kernel work (they park on a live query so loop
    bounds stay tight), so the per-chunk waste is the padding, not the
    launch: a 80k-row wave padded to one 131072 call wastes ~50k rows
    (~300ms at 1M-doc shapes), while 65536 + 16384 wastes ~1.4k. Full
    DEVICE_COVERAGE_CHUNK chunks go out first; each partial is split
    into [largest power-of-two <= r] + remainder whenever that saves
    slots vs padding r to its doubling bucket (dispatch is async, so
    extra calls overlap in the device queue)."""
    out = []
    while n >= DEVICE_COVERAGE_CHUNK:
        out.append(DEVICE_COVERAGE_CHUNK)
        n -= DEVICE_COVERAGE_CHUNK
    while n > 0:
        b = DEVICE_COVERAGE_CHUNK_MIN
        while b * 2 <= n:
            b *= 2
        if b >= n:                  # n <= CHUNK_MIN, or n exactly a bucket
            out.append(n)
            break
        rem = n - b
        rem_pad = DEVICE_COVERAGE_CHUNK_MIN
        while rem_pad < rem:
            rem_pad *= 2
        if b + rem_pad >= b * 2:    # split saves nothing vs one padded call
            out.append(n)
            break
        out.append(b)
        n = rem
    return out

# Fixed query-batch width of the coverage kernel call: qsel routes each
# candidate row to its query, so B queries cost the same round trips as one.
# Padded to a constant so a single compiled program serves every batch size.
COVERAGE_B_PAD = int(_os.environ.get("INFIDEX_TPU_COVERAGE_B", "64"))



def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in SORTED ``sorted_arr`` via searchsorted
    (np.isin re-sorts its second argument on every call — measured ~3x
    slower on the per-query prior-assembly chain)."""
    if values.size == 0 or sorted_arr.size == 0:
        return np.zeros(values.size, bool)
    j = np.searchsorted(sorted_arr, values)
    jc = np.minimum(j, sorted_arr.size - 1)
    return (j < sorted_arr.size) & (sorted_arr[jc] == values)


def _interleave_heads(parts: List[np.ndarray], k: int) -> np.ndarray:
    """Union heads taken round-robin by per-part rank (each part's 1st
    lowest id, then every part's 2nd, ...), deduped keeping the earliest
    occurrence, NOT globally-lowest ids.

    Each WordMatcher part is one quality-class list (exact word, LD1,
    one affix pattern) sorted by doc id; fusion resolves quality ties by
    ascending key, so the class winners are each part's LOWEST ids. A
    global lowest-id clip lets a dense affix part crowd the LD1/exact
    parts out of the budget entirely (measured at 1M docs: typo-mode
    recall 0.83 with global clip — every loss a not-candidate). The
    round-robin order is deterministic and monotone in ``k``, so deeper
    (oracle) candidate sets still nest production ones."""
    alive = [p[:k] for p in parts if p.size]
    if not alive:
        return np.zeros(0, np.int64)
    if len(alive) == 1:
        return alive[0][:k].astype(np.int64)
    ids = np.concatenate(alive).astype(np.int64)
    ranks = np.concatenate([np.arange(p.size) for p in alive])
    order = np.lexsort((ids, ranks))
    ids = ids[order]
    _, first = np.unique(ids, return_index=True)
    first.sort()
    return ids[first][:k]


def _native_lcs_batch():
    """Returns a (query, texts, tol) -> int32[n] callable or None.

    Case-folds both sides to match calculate_lcs (SegmentProcessor.cs)."""
    try:
        from .. import native as _nat
        if not _nat.available:
            return None
    except Exception:  # pragma: no cover
        return None

    def run(query: str, texts: List[str], tolerance: int,
            texts_lowered: bool = False):
        # norm_texts entries are built lowercase (vector_model.py:606);
        # skipping the per-text re-lower saves ~50k str allocs per batch.
        if not texts_lowered:
            texts = [t.lower() for t in texts]
        return _nat.lcs_batch(query.lower(), texts, tolerance)

    return run


def _tuples_to_arrays(tuples: List[tuple]) -> Dict[str, np.ndarray]:
    """(text_id, base, idx, key, lcs) tuples -> the chunk array bundle."""
    n = len(tuples)
    ids = np.zeros(n, np.int64)
    base = np.zeros(n, np.float32)
    idx = np.zeros(n, np.int64)
    keys = np.zeros(n, np.int64)
    lcs_v = np.zeros(n, np.float32)
    for i, (tid, b, ix, key, lv) in enumerate(tuples):
        ids[i] = tid
        base[i] = b
        idx[i] = ix
        keys[i] = key
        lcs_v[i] = lv
    return dict(ids=ids, base=base, idx=idx, keys=keys, lcs=lcs_v)


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
        # conjunctive-pool evidence (index/conjunctive.py) reaches the
        # WordMatcher through the model: the fuzzy-prefix class walks
        # its sorted affix table
        vector_model._wm_ref = word_matcher
        self._synonym_map = synonym_map
        self._sorted_vocab = None
        #: cumulative count of coverage candidates scored on the host
        #: because their docs exceed the device table shape caps
        self.coverage_host_fallback_count = 0
        self.coverage_device_count = 0
        #: always-on serving-split counters (bench.py reads these):
        #: seconds the pipeline thread spent BLOCKED on device readbacks
        #: and the device round-trip count. Under the pipelined scheduler
        #: a host-bound stream shows ~0 blocked time (readbacks return
        #: already-finished work); a device-bound stream accumulates the
        #: device's excess over the host here — wall = host + this.
        self.device_wait_s = 0.0
        self.device_calls = 0
        self._t_wm = 0.0
        self._t_prepq = 0.0
        self._t_prior = 0.0
        self._t_heads = 0.0
        self._t_memo = 0.0
        self._t_sort = 0.0
        self._t_tier_cpu = 0.0   # worker-thread CPU inside tier jobs
        self._t_wm_cpu = 0.0     # worker-thread CPU inside WM lookups
        self._t_conj_cpu = 0.0   # worker-thread CPU inside conj prefetch
        #: batch-scoped WordMatcher prefetch (query text -> Future of
        #: lookup_parts), populated while Stage-1 device calls block.
        #: Thread-local: concurrent reader threads each run their own
        #: batch and must not clear each other's in-flight prefetches.
        import threading as _threading

        self._wm_tls = _threading.local()
        #: guards the _t_*_cpu trace counters: they are read-modify-write
        #: from ThreadPoolExecutor workers, which is NOT atomic under the
        #: GIL (an interleaved update would be lost).
        self._trace_lock = _threading.Lock()

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

    def invalidate_caches(self, appended_terms=None) -> None:
        """``appended_terms`` ([(term, tid), ...] from an append-only
        finalize): the sorted-vocab cache extends instead of dropping —
        rebuilding it is an O(T log T) string sort at the next short
        query, paid every 2s under a streaming writer otherwise."""
        if appended_terms is not None and self._sorted_vocab is not None:
            self._sorted_vocab.append_terms(appended_terms)
        else:
            self._sorted_vocab = None
        if self._coverage_engine is not None:
            self._rewire_coverage()

    def _vocab(self):
        if self._sorted_vocab is None:
            self._sorted_vocab = sq._SortedVocab(self._model)
        return self._sorted_vocab

    # ------------------------------------------------------------------
    def execute(self, search_text: str, coverage_setup: Optional[CoverageSetup],
                coverage_depth: int, max_results: int = INT_MAX,
                deadline: Optional[float] = None,
                status: Optional[dict] = None,
                prefilter_mask=None) -> List[ScoreEntry]:
        """One query. ``deadline`` (perf_counter seconds) enforces
        Query.TimeOutLimitMilliseconds (Api/Query.cs:75): work is checked
        between stages and per coverage chunk; on expiry the best partial
        results so far are returned and ``status['timed_out']`` is set
        (Result.DidTimeOut, Api/Result.cs:34 — the reference wires the
        field but never enforces it; we do)."""
        if not search_text or search_text.isspace():
            return []

        if self._model.tokenizer.text_normalizer is not None:
            search_text = self._model.tokenizer.text_normalizer.normalize(search_text)

        best_segments_map: Dict[int, Tuple[float, int]] = {}

        lim_out: list = []
        stage1_entries = self._execute_relevancy_stage(
            search_text, best_segments_map, coverage_depth, max_results,
            prefilter_mask=prefilter_mask, lim_out=lim_out)
        stage1_results = consolidate_segments(stage1_entries)

        use_coverage, short_circuit = self._coverage_gate(
            search_text, coverage_setup, stage1_results, max_results)
        if not use_coverage:
            return short_circuit

        if _expired(deadline):
            # Partial results: Stage-1 ranking without the coverage rerank.
            if status is not None:
                status["timed_out"] = True
            return (stage1_results.to_entries()
                    if isinstance(stage1_results, Stage1Arrays)
                    else stage1_results)

        coverage_results = self._execute_coverage_stage(
            search_text, coverage_setup, coverage_depth, max_results,
            stage1_results, best_segments_map, deadline=deadline,
            status=status, prefilter_mask=prefilter_mask,
            lim_ids=lim_out[0] if lim_out else None)

        if not coverage_results and stage1_results:
            return stage1_results
        return coverage_results

    # ------------------------------------------------------------------
    def _coverage_gate(self, search_text: str,
                       coverage_setup: Optional[CoverageSetup],
                       stage1_results: List[ScoreEntry],
                       max_results: int):
        """Decide whether Stage 2/3 runs (SearchPipeline.cs:110-169).

        Returns (use_coverage, short_circuit_results)."""
        delims = (self._model.tokenizer.tokenizer_setup.delimiter_set
                  if self._model.tokenizer.tokenizer_setup else {" "})
        is_short_query = (0 < len(search_text) <= SHORT_QUERY_MAX_LENGTH
                          and not any(d in search_text for d in delims))

        if is_short_query and len(stage1_results) >= max_results and max_results < INT_MAX:
            if isinstance(stage1_results, Stage1Arrays):
                return False, stage1_results.to_entries(max_results)
            return False, stage1_results[:max_results]

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
            if isinstance(stage1_results, Stage1Arrays):
                return False, stage1_results.to_entries()
            return False, stage1_results
        return True, None

    # ------------------------------------------------------------------
    def execute_batch(self, search_texts: List[str],
                      coverage_setup: Optional[CoverageSetup],
                      coverage_depth: int,
                      max_results: int = INT_MAX,
                      deadlines: Optional[List[Optional[float]]] = None,
                      statuses: Optional[List[dict]] = None,
                      prefilter_mask=None) -> List[List[ScoreEntry]]:
        """Run B searches with batched device work (blocking driver for
        ``execute_batch_gen``)."""
        gen = self.execute_batch_gen(
            search_texts, coverage_setup, coverage_depth, max_results,
            deadlines=deadlines, statuses=statuses,
            prefilter_mask=prefilter_mask)
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                return stop.value

    def execute_batches_pipelined(self, specs: List[dict],
                                  pipeline_depth: int = 2
                                  ) -> List[List[List[ScoreEntry]]]:
        """Run many batches with their device work software-pipelined.

        Each spec is a kwargs dict for ``execute_batch_gen``. The
        generators yield right after DISPATCHING device work (Stage-1
        lane groups, coverage chunks) and collect it on resume; this
        scheduler round-robins up to ``pipeline_depth`` in-flight
        batches, so batch i+1's host work (tokenize, WordMatcher,
        candidate resolve) runs while batch i's programs execute on
        device. JAX dispatch is async, so no extra threads are needed —
        the measured win does not depend on the GIL being released.

        Per-batch semantics are identical to ``execute_batch``.
        """
        from collections import deque

        results: List = [None] * len(specs)
        live: deque = deque()
        nxt = 0
        while nxt < len(specs) or live:
            if nxt < len(specs) and len(live) < pipeline_depth:
                item = (nxt, self.execute_batch_gen(**specs[nxt]))
                nxt += 1
            else:
                item = live.popleft()
            try:
                next(item[1])
                live.append(item)
            except StopIteration as stop:
                results[item[0]] = stop.value
        return results

    def execute_batch_gen(self, search_texts: List[str],
                          coverage_setup: Optional[CoverageSetup],
                          coverage_depth: int,
                          max_results: int = INT_MAX,
                          deadlines: Optional[List[Optional[float]]] = None,
                          statuses: Optional[List[dict]] = None,
                          prefilter_mask=None):
        """Generator form of batched search: yields while device work is
        in flight so a scheduler can interleave other batches' host work.

        Semantics are identical to ``execute`` per query; the device calls
        are shared: ONE Stage-1 kernel call scores every query's postings
        ([B, N] scatter + batched top-k), and the coverage kernel scores
        chunks of candidates drawn from all queries (qsel routing). On
        high-latency device links this divides the round-trip cost by B.
        """
        import time as _time

        trace = _os.environ.get("INFIDEX_TPU_TRACE")
        t_trace = _time.perf_counter() if trace else 0.0

        def _mark(stage):
            # [PIPE]-style per-stage timing (SearchPipeline.cs:51-203)
            nonlocal t_trace
            if trace:
                now = _time.perf_counter()
                print(f"[PIPE] {stage}: {(now - t_trace) * 1000:.1f}ms",
                      flush=True)
                t_trace = now

        n = len(search_texts)
        out: List[Optional[List[ScoreEntry]]] = [None] * n
        norm = self._model.tokenizer.text_normalizer
        fast_ok = self._fast_path_ok(coverage_setup)

        texts = []
        for text in search_texts:
            if text and not text.isspace() and norm is not None:
                text = norm.normalize(text)
            texts.append(text)

        # ---- Stage 1: host prep per query, ONE batched device call -----
        bsm: List[Dict] = [dict() for _ in range(n)]
        stage1: List = [[] for _ in range(n)]   # entries or Stage1Arrays
        lims: List[Optional[np.ndarray]] = [None] * n  # low-id matchers
        tfidf_queries: List[Optional[str]] = [None] * n
        for i, text in enumerate(texts):
            if not text or text.isspace():
                out[i] = []
                continue
            can_use_ngrams, has_mixed, long_words_text = analyze_query(
                text, self._model.tokenizer)
            if not can_use_ngrams:
                stage1[i] = self._execute_relevancy_stage(
                    text, bsm[i], coverage_depth, max_results,
                    prefilter_mask=prefilter_mask)
                continue   # short-query paths have no LIM rows
            tfidf_query = long_words_text if has_mixed else text
            if not tfidf_query or tfidf_query.isspace():
                tfidf_query = text
            tfidf_queries[i] = tfidf_query

        # WordMatcher lookups depend only on query text; prefetch them on
        # host threads so they overlap the Stage-1 device round trips
        # below (numpy set ops release the GIL while device_get blocks).
        # _coverage_begin(_fast) consumes self._wm_prefetch.
        # Per-BATCH prefetch maps (not plain thread-locals): interleaved
        # generators share the pipeline thread, so each one re-installs its
        # own maps right after every yield point.
        wm_pool = None
        prefetch_d: Dict = {}
        conj_d: Dict = {}
        self._wm_tls.prefetch = prefetch_d
        self._wm_tls.conj = conj_d
        if self._word_matcher is not None and self._word_matcher._finalized:
            from concurrent.futures import ThreadPoolExecutor

            live = [t for i, t in enumerate(texts)
                    if t and not t.isspace() and out[i] is None]
            if live:
                wm_pool = ThreadPoolExecutor(max_workers=min(4, len(live)))
                cps = coverage_setup.cover_prefix_suffix

                def _timed_wm(t_):
                    t0_ = _time.perf_counter()
                    try:
                        return self._word_matcher.lookup_parts_grouped(
                            t_, cps)
                    finally:
                        with self._trace_lock:
                            self._t_wm_cpu += _time.perf_counter() - t0_

                for t in dict.fromkeys(live):
                    self._wm_tls.prefetch[t] = wm_pool.submit(_timed_wm, t)

        # Resolve every unknown token of the whole batch in ONE device
        # round trip (MXU signature matmul) before per-query prep.
        self._prime_fuzzy_tokens([t for t in tfidf_queries if t is not None])
        _mark("  s1-prime")

        batch_items = []   # (query index, stage-1 prep tuple) -> device
        tier_jobs = []     # (query index, prep) -> host tiered Stage-1
        model = self._model
        for i, tfidf_query in enumerate(tfidf_queries):
            if tfidf_query is None:
                continue
            prep = model.prepare_stage1(tfidf_query)
            if prep is None:
                continue
            if (model._tier_gate(prep)):
                tier_jobs.append((i, prep))
            else:
                batch_items.append((i, prep))
            # Conjunctive-tier prefetch (index/conjunctive.py): chained
            # after the query's WordMatcher lookup on the same FIFO pool
            # (every wm job is queued ahead, so no self-wait), overlapping
            # the Stage-1 device round trip below.
            if (wm_pool is not None and model.built is not None
                    and texts[i] not in self._wm_tls.conj):
                wm_fut = self._wm_tls.prefetch.get(texts[i])
                if wm_fut is not None:
                    self._wm_tls.conj[texts[i]] = wm_pool.submit(
                        self._conj_job, wm_fut, prep)
        _mark("  s1-prep")

        # Tiered queries run on host threads (numpy set ops release the
        # GIL) and OVERLAP the blocking device round trip below.
        tier_futures = []
        tier_batch_fut = None
        pool = None
        if tier_jobs:
            from concurrent.futures import ThreadPoolExecutor

            from .. import native as _nat

            batchable = (_nat.available and prefilter_mask is None
                         and not model.device_pool_scoring_ok()
                         and model._tiered_for() is not None)
            pool = ThreadPoolExecutor(
                max_workers=1 if batchable else min(8, len(tier_jobs)))

            if batchable:
                # ONE GIL-released native call selects + scores the whole
                # tier group (native/_lib.cpp infidex_tier_batch) —
                # replaces per-query submit/marshal/argsort glue that
                # cost ~0.7ms/query warm at 1M docs (VERDICT r4 task #3).
                tiered_ = model._tiered_for()
                preps_t = [prep for _, prep in tier_jobs]

                def _timed_tier_batch():
                    t0_ = _time.perf_counter()
                    try:
                        return tiered_.run_batch(preps_t, coverage_depth)
                    finally:
                        with self._trace_lock:
                            self._t_tier_cpu += _time.perf_counter() - t0_

                tier_batch_fut = pool.submit(_timed_tier_batch)
            else:
                def _timed_tier(prep_):
                    t0_ = _time.perf_counter()
                    try:
                        return model.stage1_tier_select(
                            prep_, coverage_depth, prefilter_mask)
                    finally:
                        # Lock-guarded: += on an attribute is not atomic
                        # under the GIL. Trace-only diagnostics.
                        with self._trace_lock:
                            self._t_tier_cpu += _time.perf_counter() - t0_

                for i, prep in tier_jobs:
                    tier_futures.append(
                        (i, prep, pool.submit(_timed_tier, prep)))

        handles = None
        outs: list = []
        if batch_items:
            if model.device is None:
                model.build_inverted_lists()
            preps_b = [prep for _, prep in batch_items]
            if model.host_stage1_ok(preps_b, len(preps_b)):
                # tiny batch, tiny lane count: the exact host scatter
                # undercuts the device link round trip (single-query p50)
                outs = model.host_stage1.search_batch(
                    preps_b, coverage_depth,
                    total_docs=model.documents.count,
                    stop_term_limit=model.stop_term_limit,
                    host_mask=prefilter_mask)
            elif hasattr(model.stage1_backend, "search_batch_dispatch"):
                # Pipeline point 1: Stage-1 lane groups go in flight on
                # device; the collect happens AFTER the tier futures
                # resolve below, so tier-fallback stragglers dispatch
                # alongside the main group instead of paying a second,
                # serialized device round trip (measured ~50-90ms/batch
                # at 300k docs).
                handles = model.stage1_backend.search_batch_dispatch(
                    preps_b, coverage_depth,
                    total_docs=model.documents.count,
                    stop_term_limit=model.stop_term_limit,
                    live_override=model.stage1_live_override(prefilter_mask))
            else:
                outs = model.stage1_backend.search_batch(
                    preps_b, coverage_depth,
                    total_docs=model.documents.count,
                    stop_term_limit=model.stop_term_limit,
                    live_override=model.stage1_live_override(prefilter_mask))

        def _finish_s1(pairs, outs_):
            for (i, _), o in zip(pairs, outs_):
                scores, ids = o[0], o[1]
                if len(o) > 2:
                    lims[i] = o[2]
                if fast_ok:
                    stage1[i] = model.finish_stage1_arrays(scores, ids)
                else:
                    stage1[i] = model.finish_stage1(scores, ids, bsm[i])

        # Resolve the host-tier futures while the main device group is in
        # flight (tier jobs cost ~1.3ms/query of real CPU; the device wait
        # is 100s of ms on a tunneled link).
        fallback = []
        fallback_outs = None
        fallback_handles = None
        pool_jobs: list = []      # (i, (pool, term_ids, idfs)) device-scored
        pool_handle = None
        if tier_batch_fut is not None:
            # Whole-group native results, aligned with tier_jobs: entries
            # are (scores, ids, lim) or None (union/empty -> device).
            for (i, prep), out_b in zip(tier_jobs, tier_batch_fut.result()):
                tier_futures.append((i, prep, out_b))
        if tier_futures:
            for i, prep, fut in tier_futures:
                out_t = fut.result() if hasattr(fut, "result") else (
                    None if fut is None else ("scored",) + fut)
                if out_t is None:
                    fallback.append((i, prep))
                    continue
                if out_t[0] == "pool":
                    # Device scores this pool (exact, full base CSR);
                    # the LIM ids are already host-computed.
                    _, cand_pool, t_ids, t_idfs, lim = out_t
                    lims[i] = lim
                    pool_jobs.append((i, (cand_pool, t_ids, t_idfs)))
                    continue
                _, scores, ids, lim = out_t
                lims[i] = lim
                if fast_ok:
                    stage1[i] = model.finish_stage1_arrays(scores, ids)
                else:
                    stage1[i] = model.finish_stage1(scores, ids, bsm[i])
            pool.shutdown(wait=False)
            _mark("  s1-tier")
            if fallback:
                preps_f = [prep for _, prep in fallback]
                if model.host_stage1_ok(preps_f, len(preps_f),
                                        max_batch=8):
                    # Stragglers: the exact host scatter undercuts a
                    # dedicated device round trip (~45-170ms on the
                    # tunnel for a near-empty batch). Wider batch cap
                    # than the main-path gate — the alternative here is
                    # a SECOND serialized device call, not a shared one.
                    fallback_outs = model.host_stage1.search_batch(
                        preps_f, coverage_depth,
                        total_docs=model.documents.count,
                        stop_term_limit=model.stop_term_limit,
                        host_mask=prefilter_mask)
                else:
                    if model.device is None:
                        model.build_inverted_lists()
                    if (handles is not None and hasattr(
                            model.stage1_backend, "search_batch_dispatch")):
                        # main group still in flight: pipeline behind it
                        fallback_handles = \
                            model.stage1_backend.search_batch_dispatch(
                                preps_f, coverage_depth,
                                total_docs=model.documents.count,
                                stop_term_limit=model.stop_term_limit,
                                live_override=model.stage1_live_override(
                                    prefilter_mask))
                    else:
                        fallback_outs = model.stage1_backend.search_batch(
                            preps_f, coverage_depth,
                            total_docs=model.documents.count,
                            stop_term_limit=model.stop_term_limit,
                            live_override=model.stage1_live_override(
                                prefilter_mask))
        if pool_jobs:
            # ONE device call scores every tier pool exactly (full base
            # CSR binary-search join, device.py _pool_score_kernel),
            # queued behind the main group — async, collected below.
            pool_handle = model.device.pool_score_dispatch(
                [job for _, job in pool_jobs], coverage_depth)

        if handles is not None:
            # Pipeline point 1: everything Stage-1 is in flight; yield so
            # the scheduler can run another batch's host work, then collect.
            yield "s1"
            self._wm_tls.prefetch = prefetch_d
            self._wm_tls.conj = conj_d
            t0w = _time.perf_counter()
            outs = model.stage1_backend.search_batch_collect(handles)
            self.device_wait_s += _time.perf_counter() - t0w
            self.device_calls += len(handles)
        if batch_items:
            _finish_s1(batch_items, outs)
        _mark("  s1-device")
        if fallback_handles is not None:
            t0w = _time.perf_counter()
            fallback_outs = model.stage1_backend.search_batch_collect(
                fallback_handles)
            self.device_wait_s += _time.perf_counter() - t0w
            self.device_calls += len(fallback_handles)
        if fallback_outs is not None:
            _finish_s1(fallback, fallback_outs)
        if pool_handle is not None:
            t0w = _time.perf_counter()
            pool_outs = model.device.pool_score_collect(pool_handle)
            self.device_wait_s += _time.perf_counter() - t0w
            self.device_calls += 1
            for (i, _), (scores, ids) in zip(pool_jobs, pool_outs):
                if fast_ok:
                    stage1[i] = model.finish_stage1_arrays(scores, ids)
                else:
                    stage1[i] = model.finish_stage1(scores, ids, bsm[i])

        _mark("stage1")

        # ---- Gate + coverage jobs (batched device coverage) ------------
        jobs = []
        job_of: Dict[int, dict] = {}
        for i, text in enumerate(texts):
            if out[i] is not None:
                continue
            stage1_results = stage1[i]
            if isinstance(stage1_results, Stage1Arrays):
                # 1:1 id<->key: ids are unique, so consolidation reduces to
                # the (score desc, tie desc, key asc) sort.
                t0s = _time.perf_counter()
                order = np.lexsort((stage1_results.keys,
                                    -stage1_results.scores))
                stage1_results = Stage1Arrays(
                    stage1_results.scores[order], stage1_results.iids[order],
                    stage1_results.keys[order])
                self._t_sort += _time.perf_counter() - t0s
            else:
                stage1_results = consolidate_segments(stage1_results)
            stage1[i] = stage1_results
            use_coverage, short_circuit = self._coverage_gate(
                text, coverage_setup, stage1_results, max_results)
            if not use_coverage:
                out[i] = short_circuit
                continue
            dl = deadlines[i] if deadlines is not None else None
            if _expired(dl):
                # Deadline already passed: partial (Stage-1-only) results.
                if statuses is not None:
                    statuses[i]["timed_out"] = True
                out[i] = (stage1_results.to_entries()
                          if isinstance(stage1_results, Stage1Arrays)
                          else stage1_results)
                continue
            if isinstance(stage1_results, Stage1Arrays):
                job = self._coverage_begin_fast(
                    text, coverage_setup, coverage_depth, stage1_results,
                    prefilter_mask=prefilter_mask, lim_ids=lims[i])
            else:
                job = self._coverage_begin(
                    text, coverage_setup, coverage_depth, stage1_results,
                    bsm[i], prefilter_mask=prefilter_mask,
                    lim_ids=lims[i])
            job["deadline"] = dl
            job["status"] = statuses[i] if statuses is not None else None
            jobs.append(job)
            job_of[i] = job

        if trace:
            print(f"[PIPE]   gate-detail: wm={self._t_wm*1000:.1f}ms "
                  f"prep_query={self._t_prepq*1000:.1f}ms "
                  f"prior={self._t_prior*1000:.1f}ms "
                  f"heads={self._t_heads*1000:.1f}ms "
                  f"memo={self._t_memo*1000:.1f}ms "
                  f"s1sort={self._t_sort*1000:.1f}ms "
                  f"tier_cpu={self._t_tier_cpu*1000:.1f}ms "
                  f"wm_cpu={self._t_wm_cpu*1000:.1f}ms "
                  f"conj_cpu={self._t_conj_cpu*1000:.1f}ms", flush=True)
            self._t_tier_cpu = 0.0
            self._t_wm_cpu = self._t_conj_cpu = 0.0
            self._t_wm = self._t_prepq = 0.0
            self._t_prior = self._t_heads = self._t_memo = 0.0
            self._t_sort = 0.0
        _mark("gate+begin")
        if jobs:
            # Pipeline point 2: coverage chunks dispatched (plus host-
            # oracle leftovers already scored); yield while they execute.
            cov_state = self._coverage_run_begin(jobs, coverage_setup)
            yield "cov"
            self._wm_tls.prefetch = prefetch_d
            self._wm_tls.conj = conj_d
            self._coverage_run_end(cov_state)
        _mark("coverage")

        for i, job in job_of.items():
            if job.get("fast"):
                coverage_results = self._coverage_finish_fast(
                    job, coverage_setup, coverage_depth, max_results)
            else:
                coverage_results = self._coverage_finish(
                    job, coverage_setup, coverage_depth, max_results)
            if not coverage_results and stage1[i]:
                s1 = stage1[i]
                out[i] = (s1.to_entries() if isinstance(s1, Stage1Arrays)
                          else s1)
            else:
                out[i] = coverage_results
        _mark("finish")
        if wm_pool is not None:
            wm_pool.shutdown(wait=False)
        self._wm_tls.prefetch = {}
        return [r if r is not None else [] for r in out]

    # ------------------------------------------------------------------
    def _wm_lookup_parts(self, search_text: str,
                         cover_prefix_suffix: bool
                         ) -> List[List[np.ndarray]]:
        """Per-token WordMatcher part groups for one query, via the
        batch prefetch when one is in flight (keyed by query text)."""
        if self._word_matcher is None:
            return []
        fut = getattr(self._wm_tls, "prefetch", {}).get(search_text)
        if fut is not None:
            return fut.result()
        return self._word_matcher.lookup_parts_grouped(search_text,
                                                       cover_prefix_suffix)

    def _conj_job(self, wm_fut, prep) -> np.ndarray:
        """Prefetch-pool worker: wait for the query's WordMatcher groups,
        then build the conjunctive pool (runs off the pipeline thread)."""
        import time as _time

        groups = wm_fut.result()
        t0_ = _time.perf_counter()
        try:
            if len(groups) < 2:
                return np.zeros(0, np.int64)
            from ..index.conjunctive import conjunctive_pool

            return conjunctive_pool(self._model, groups, prep)
        finally:
            with self._trace_lock:
                self._t_conj_cpu += _time.perf_counter() - t0_

    def _conj_lookup(self, search_text: str,
                     wm_groups) -> np.ndarray:
        """Token-conjunctive candidates for one query
        (``index/conjunctive.py``), via the batch prefetch when one is
        in flight (keyed by exact query text); synchronous otherwise."""
        fut = getattr(self._wm_tls, "conj", {}).get(search_text)
        if fut is not None:
            return fut.result()
        from ..index.conjunctive import CONJ_CAP, conjunctive_pool

        if (CONJ_CAP <= 0 or len(wm_groups) < 2
                or self._model.built is None):
            return np.zeros(0, np.int64)
        prep = self._model.prepare_stage1(search_text)
        return conjunctive_pool(self._model, wm_groups, prep)

    # ------------------------------------------------------------------
    def _class_prior_ids(self, search_text: str, budget: int) -> np.ndarray:
        """Candidate-selection prior: the docs the fusion scorer's TOP
        precedence classes would rank first (see index/first_token.py).

        Single-word queries: exact-start > prefix-start > fuzzy-start
        docs, each ascending id (the fusion within-class tie order is
        ascending key). Multi-word queries: the all-known-terms postings
        intersection (coverage_tier-3 members). Applied identically at
        every coverage depth, so deeper (oracle) candidate sets nest
        production ones."""
        if budget <= 0:
            return np.zeros(0, np.int64)
        model = self._model
        fti = model.first_token_index
        if fti is None or model.built is None:
            return np.zeros(0, np.int64)
        setup = model.tokenizer.tokenizer_setup
        delims = setup.delimiter_set if setup else {" "}
        words, cur = [], []
        for ch in search_text:
            if ch in delims:
                if cur:
                    words.append("".join(cur))
                    cur = []
            else:
                cur.append(ch)
        if cur:
            words.append("".join(cur))
        if not words:
            return np.zeros(0, np.int64)
        if len(words) == 1:
            return fti.class_prior(words[0], budget)
        # multi-word: ordered intersection of the words' posting lists
        from ..index.candidates import _ordered_isect

        built = model.built
        parts = []
        for w in words:
            tid = built.term_to_id.get(w, -1)
            if tid < 0 or built.df[tid] <= 0:
                continue
            parts.append(built.postings_for(int(tid))[0].astype(np.int64))
        if len(parts) < 2:
            return np.zeros(0, np.int64)
        parts.sort(key=lambda a: a.size)
        inter = parts[0]
        for p_ in parts[1:]:
            inter = _ordered_isect(inter, p_)
            if inter.size == 0:
                break
        return inter[:budget]

    # ------------------------------------------------------------------
    def _assemble_prior(self, search_text: str, budget: int,
                        tfidf_arr: np.ndarray, prefilter_mask,
                        lim_ids, conj=None):
        """Fusion-class prior candidates ahead of the WordMatcher heads
        (index/first_token.py), deduped against Stage-1 candidates and
        clipped to the depth budget. Applied identically at every depth
        (oracle candidate sets nest production ones).

        ``conj``: the token-conjunctive pool (index/conjunctive.py),
        appended after the exact-words class prior in its OWN additive
        slice (CONJ_TAKE) — measured at 1M docs, letting the conj pool
        ride inside the shared budget crowded the WordMatcher heads out
        entirely (a doc at wm-part rank 45 went un-scored).

        Returns (prior_ids, effective_budget): callers size the
        WordMatcher head fill against the extended budget so the conj
        slice is additive, not displacing."""
        prior = self._class_prior_ids(search_text, budget)
        if prefilter_mask is not None and prior.size:
            prior = prior[prefilter_mask[prior]]
        extra = 0
        if conj is not None and conj.size:
            # Slice through the END of the pool's leading (strong,
            # tok_n) class when it straddles CONJ_TAKE: class members
            # are indistinguishable to the pool's own tiebreak, and a
            # flat cut buries fusion's winners (loss_diag 'viussador
            # dor': oracle top-10 at pool ranks 618-795 inside an
            # ~800-doc top class). Bounded at 4x so a degenerate class
            # cannot flood the coverage budget.
            take = max(CONJ_TAKE,
                       min(getattr(conj, "first_class", 0), 4 * CONJ_TAKE))
            if prefilter_mask is not None:
                conj = conj[prefilter_mask[conj]]
            if prior.size:
                conj = conj[~_in_sorted(conj, np.sort(prior))]
            conj = conj[:take]
            extra = int(conj.size)
            prior = np.concatenate([prior, conj]) if prior.size else conj
        if prior.size:
            prior = prior[~_in_sorted(prior, tfidf_arr)][:budget + extra]
        return prior.astype(np.int64), budget + extra

    def _lim_tail(self, lim_ids, budget: int, tfidf_arr: np.ndarray,
                  taken: np.ndarray) -> np.ndarray:
        """Low-id matchers (device.py LIM rows) fill whatever depth
        budget the WordMatcher heads left UNUSED — they rescue queries
        whose WM union is small or empty (gram-only matches resolved by
        ascending key in huge fusion tie classes) without displacing the
        higher-precision WM candidates."""
        if lim_ids is None or budget <= 0:
            return np.zeros(0, np.int64)
        lim = np.asarray(lim_ids, np.int64)
        lim = lim[lim < self._model.doc_keys_arr.size]
        if not lim.size:
            return lim
        lim = lim[~_in_sorted(lim, tfidf_arr)]
        if taken.size:
            lim = lim[~_in_sorted(lim, np.sort(taken))]
        return lim[:budget]

    # ------------------------------------------------------------------
    def _prime_fuzzy_tokens(self, query_texts: List[str]) -> None:
        """Collect unknown (fuzzy-eligible) tokens across the batch and
        resolve them with one ``VectorModel.prime_fuzzy_cache`` call."""
        model = self._model
        if model.built is None or not query_texts:
            return
        term_to_id = model.built.term_to_id
        df = model.built.df
        unknown: List[str] = []
        seen = set()
        for text in query_texts:
            for tok in model.tokenizer.tokenize_for_search(text):
                if len(tok) < 4 or tok in seen:
                    continue
                seen.add(tok)
                tid = term_to_id.get(tok, -1)
                if tid < 0 or df[tid] <= 0:
                    unknown.append(tok)
        if unknown:
            model.prime_fuzzy_cache(unknown)

    # ------------------------------------------------------------------
    def _fast_path_ok(self, coverage_setup) -> bool:
        """True when the vectorized (array) pipeline applies: every doc is
        its own single segment (1:1 internal id <-> public key), no synonym
        canonicalization rewrites candidate texts, the device coverage
        tables exist, and lexical prescreen (an entry-list transform) is
        off. Semantics on this path are identical to the entry-based path —
        asserted by tests/test_fast_path_parity.py."""
        model = self._model
        if model.documents.multi_segment:
            return False
        if (self._synonym_map is not None
                and self._synonym_map.has_canonical_mappings):
            return False
        if model.coverage_tables is None or model.norm_texts is None:
            return False
        if model.norm_texts.size < len(model.documents):
            return False
        if coverage_setup is not None and coverage_setup.enable_lexical_prescreen:
            return False
        return True

    # ------------------------------------------------------------------
    def _execute_relevancy_stage(self, search_text: str,
                                 best_segments_map, coverage_depth: int,
                                 max_results: int,
                                 prefilter_mask=None,
                                 lim_out: Optional[list] = None
                                 ) -> List[ScoreEntry]:
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
            fast_entries = sq.search_short_query_fast(
                search_text.lower(), self._model, self._vocab(),
                max_results=max_results)
            if fast_entries is not None:
                return fast_entries
            return sq.search_short_query(
                search_text.lower(), self._model, best_segments_map, self._vocab())

        tfidf_query = long_words_text if has_mixed else search_text
        if not tfidf_query or tfidf_query.isspace():
            tfidf_query = search_text
        return self._model.search(tfidf_query, coverage_depth,
                                  best_segments_map,
                                  prefilter_mask=prefilter_mask,
                                  lim_out=lim_out)

    # ------------------------------------------------------------------
    def _execute_coverage_stage(self, search_text: str, coverage_setup: CoverageSetup,
                                coverage_depth: int, max_results: int,
                                top_candidates: List[ScoreEntry],
                                best_segments_map, deadline=None,
                                status=None,
                                prefilter_mask=None,
                                lim_ids=None) -> List[ScoreEntry]:
        job = self._coverage_begin(search_text, coverage_setup, coverage_depth,
                                   top_candidates, best_segments_map,
                                   prefilter_mask=prefilter_mask,
                                   lim_ids=lim_ids)
        job["deadline"] = deadline
        job["status"] = status
        self._coverage_run([job], coverage_setup)
        return self._coverage_finish(job, coverage_setup, coverage_depth,
                                     max_results)

    # ------------------------------------------------------------------
    def _coverage_run(self, jobs: List[dict], coverage_setup: CoverageSetup) -> None:
        """Score every job's worklist: batched device kernel where eligible
        (across ALL jobs — one program call scores many queries' candidates),
        host oracle for the rest."""
        self._coverage_run_end(self._coverage_run_begin(jobs, coverage_setup))

    def _coverage_run_begin(self, jobs: List[dict],
                            coverage_setup: CoverageSetup) -> dict:
        """Non-blocking half of ``_coverage_run``: encode queries, resolve
        candidates, DISPATCH every device chunk, and run the host-oracle
        leftovers. Returns the in-flight state for ``_coverage_run_end``;
        the split lets the batch pipeline run another batch's host work
        while the chunks execute on device."""
        model = self._model

        # Phase 1 — encode every eligible query (cheap, no candidate work).
        device_jobs = []
        for job in jobs:
            if _job_expired(job):
                # Deadline passed before any coverage work: skip the job
                # entirely — empty coverage results fall back to Stage-1.
                job["_host_all"] = False
                continue
            n_work = (job["worklist_ids"].size if job.get("fast")
                      else len(job["worklist"]))
            # Interactive path: a lone job below the single-query
            # threshold scores on the host oracle (bit-identical to the
            # kernel) instead of paying the device link round trip.
            min_work = (DEVICE_COVERAGE_MIN_SINGLE
                        if len(jobs) == 1 and job.get("fast")
                        else DEVICE_COVERAGE_MIN_CANDIDATES)
            enc = None
            if (model.coverage_tables is not None and n_work >= min_work):
                enc = self._encode_job_query(job)
            job["_host_all"] = enc is None
            if enc is not None:
                device_jobs.append((job, enc))

        # Phase 2 — resolve candidates per job and dispatch each chunk the
        # moment it fills (JAX dispatch is async): the device crunches chunk
        # k while the host resolves candidates for chunk k+1.
        import time as _time
        trace = _os.environ.get("INFIDEX_TPU_TRACE")
        t_resolve = t_dispatch = 0.0
        n_chunks = n_cands = 0
        pending: List[tuple] = []
        leftover_work: List[tuple] = []
        if device_jobs:
            from ..ops.coverage_kernel import (CoverageConfig, D_CAP_NARROW,
                                               D_CAP_SMALL, L_CAP_SMALL)
            config = CoverageConfig.from_setup(coverage_setup)
            # Three chunk streams by doc/query shape: the kernel's work is
            # O(D) to O(D*L^2) per candidate, so short docs with short
            # words (the common case for title corpora) run a program
            # compiled at (D_CAP_SMALL, L_CAP_SMALL) — a fraction of the
            # full-width cost; mid docs at the narrow D; the rest at the
            # full table width.
            config_narrow = config._replace(d_cap=D_CAP_NARROW)
            config_small = config._replace(d_cap=D_CAP_SMALL)
            tables = model.coverage_tables
            tok_counts = tables.tok_count_host
            max_wlens = tables.max_wlen_host
            for ws in range(0, len(device_jobs), COVERAGE_B_PAD):
                wave = device_jobs[ws : ws + COVERAGE_B_PAD]
                encs = [enc for _, enc in wave]
                # Pad the query axis to a fixed B so one compiled program
                # serves every batch size (pad rows repeat query 0).
                while len(encs) < COVERAGE_B_PAD:
                    encs.append(encs[0])
                wave_args = {
                    "small": self._stack_wave(encs, L_CAP_SMALL),
                    "narrow": self._stack_wave(encs),
                }
                wave_args["wide"] = wave_args["narrow"]
                configs = {"small": config_small, "narrow": config_narrow,
                           "wide": config}
                wave_jobs = [job for job, _ in wave]
                # Per shape-class accumulators of per-job candidate arrays.
                acc = {"small": [], "narrow": [], "wide": []}
                t0 = _time.perf_counter() if trace else 0.0
                for qi, (job, enc) in enumerate(wave):
                    if _job_expired(job):
                        continue   # per-chunk deadline: drop unscored work
                    if job.get("fast"):
                        cand, leftover = self._resolve_candidates_fast(job,
                                                                       enc)
                        if leftover[0].size:
                            leftover_work.append((job, leftover))
                    else:
                        tuples, leftovers = self._resolve_candidates(job)
                        if leftovers:
                            leftover_work.append((job, leftovers))
                        cand = _tuples_to_arrays(tuples)
                    n_cands += int(cand["ids"].size)
                    tc = tok_counts[cand["ids"]]
                    small = ((tc <= D_CAP_SMALL)
                             & (max_wlens[cand["ids"]] <= L_CAP_SMALL)
                             if enc["q_maxlen"] <= L_CAP_SMALL
                             else np.zeros(cand["ids"].size, bool))
                    narrow = ~small & (tc <= D_CAP_NARROW)
                    wide = ~small & ~narrow
                    for cls, m in (("small", small), ("narrow", narrow),
                                   ("wide", wide)):
                        if m.any():
                            acc[cls].append((qi, {k: v[m]
                                                  for k, v in cand.items()}))
                if trace:
                    t_resolve += _time.perf_counter() - t0

                # Tiny waves (a single interactive query, or a trickle
                # batch) whose candidates span shape classes would pay one
                # ~35ms link round trip PER class; below one chunk-min of
                # total work, run everything as ONE call at the widest
                # class present (identical scores — the class split only
                # picks a cheaper compiled width).
                total_c = sum(c["ids"].size for cl in acc.values()
                              for _, c in cl)
                if total_c <= DEVICE_COVERAGE_CHUNK_MIN and sum(
                        1 for cl in acc.values() if cl) > 1:
                    widest = ("wide" if acc["wide"] else "narrow")
                    merged = acc["small"] + acc["narrow"] + acc["wide"]
                    merged.sort(key=lambda t: t[0])  # qsel monotone
                    acc = {"small": [], "narrow": [], "wide": []}
                    acc[widest] = merged

                t0 = _time.perf_counter() if trace else 0.0
                for cls in ("small", "narrow", "wide"):
                    if not acc[cls]:
                        continue
                    ids = np.concatenate([c["ids"] for _, c in acc[cls]])
                    base = np.concatenate([c["base"] for _, c in acc[cls]])
                    lcs_v = np.concatenate([c["lcs"] for _, c in acc[cls]])
                    idx = np.concatenate([c["idx"] for _, c in acc[cls]])
                    keys = np.concatenate([c["keys"] for _, c in acc[cls]])
                    qsel = np.concatenate(
                        [np.full(c["ids"].size, qi, np.int32)
                         for qi, c in acc[cls]])
                    s = 0
                    for step in _chunk_sizes(int(ids.size)):
                        e = s + step
                        out = self._dispatch_chunk(
                            ids[s:e], qsel[s:e], base[s:e], lcs_v[s:e],
                            wave_args[cls], configs[cls])
                        pending.append((out, qsel[s:e], idx[s:e], keys[s:e],
                                        e - s, wave_jobs))
                        n_chunks += 1
                        s = e
                if trace:
                    t_dispatch += _time.perf_counter() - t0

        # Phase 3 — host-oracle work overlaps the in-flight device chunks.
        t0 = _time.perf_counter() if trace else 0.0
        for job in jobs:
            if job["_host_all"]:
                if job.get("fast"):
                    self._host_score_fast(job, job["worklist_ids"],
                                          job["worklist_base"])
                else:
                    for ci, (internal_id, base_score) in enumerate(
                            job["worklist"]):
                        if ci % 256 == 0 and _job_expired(job):
                            break
                        job["process"](internal_id, base_score)
        for job, leftovers in leftover_work:
            if job.get("fast"):
                self._host_score_fast(job, leftovers[0], leftovers[1])
            else:
                for ci, (internal_id, base_score) in enumerate(leftovers):
                    if ci % 256 == 0 and _job_expired(job):
                        break
                    job["process"](internal_id, base_score)
        t_host = (_time.perf_counter() - t0) if trace else 0.0
        return dict(jobs=jobs, pending=pending, leftover_work=leftover_work,
                    n_chunks=n_chunks, n_cands=n_cands, trace=trace,
                    t_resolve=t_resolve, t_dispatch=t_dispatch,
                    t_host=t_host)

    def _coverage_run_end(self, state: dict) -> None:
        """Blocking half of ``_coverage_run``: read back the dispatched
        chunks and do the fallback accounting."""
        import time as _time

        jobs = state["jobs"]
        pending = state["pending"]
        leftover_work = state["leftover_work"]
        n_cands = state["n_cands"]
        trace = state["trace"]
        t0 = _time.perf_counter() if trace else 0.0
        self._device_collect(pending)
        # Host-fallback accounting: candidates that bypassed the device
        # kernel because their doc exceeds the table shape caps (a silent
        # cliff otherwise — VERDICT r01 weak #7). Cumulative on the
        # pipeline so serving dashboards can watch the rate.
        n_fallback = 0
        for job, leftovers in leftover_work:
            n_fallback += (int(leftovers[0].size) if job.get("fast")
                           else len(leftovers))
        for job in jobs:
            if job.get("_host_all"):
                n_fallback += (int(job["worklist_ids"].size)
                               if job.get("fast") else len(job["worklist"]))
        self.coverage_host_fallback_count += n_fallback
        self.coverage_device_count += n_cands
        if trace:
            t_collect = _time.perf_counter() - t0
            print(f"[PIPE]   cov-detail: resolve={state['t_resolve']*1000:.1f}ms "
                  f"dispatch={state['t_dispatch']*1000:.1f}ms "
                  f"host={state['t_host']*1000:.1f}ms "
                  f"collect={t_collect*1000:.1f}ms "
                  f"chunks={state['n_chunks']} cands={n_cands} "
                  f"host_fallback={n_fallback}", flush=True)

    # ------------------------------------------------------------------
    def _coverage_begin(self, search_text: str, coverage_setup: CoverageSetup,
                        coverage_depth: int,
                        top_candidates: List[ScoreEntry],
                        best_segments_map, prefilter_mask=None,
                        lim_ids=None) -> dict:
        """Host-side setup shared by single and batched coverage execution.

        Returns a job dict with the worklist, memo tables, and the closures
        that score one candidate on the host oracle."""
        model = self._model
        if len(top_candidates) > coverage_depth:
            top_candidates = top_candidates[:coverage_depth]

        if coverage_setup.enable_lexical_prescreen and top_candidates:
            top_candidates = self._lexical_prescreen(search_text, top_candidates, coverage_setup)

        wm_groups = self._wm_lookup_parts(
            search_text, coverage_setup.cover_prefix_suffix)
        if prefilter_mask is not None:
            # pre-filter: WordMatcher candidates outside the filter can
            # never be returned; dropping them here lets matching docs
            # deeper in the lists into the coverage_depth budget.
            wm_groups = [(w, [p[prefilter_mask[p]] for p in g])
                         for w, g in wm_groups]
        wm_parts = [p for _, g in wm_groups for p in g]
        has_wm = any(p.size for p in wm_parts)

        context = self._coverage_engine.prepare_query(search_text)

        tfidf_internal: Set[int] = set()
        for c in top_candidates:
            doc = model.documents.get_document_by_public_key(c.document_id)
            if doc is not None:
                tfidf_internal.add(doc.id)

        # WordMatcher hit lists scale with document frequency (a common
        # word matches 10^5 docs on large corpora, affix lookups union up
        # to 4096 term lists). The pipeline only consumes (a) which Stage-1
        # candidates the union contains, (b) the union's smallest wm_limit
        # ids outside those, and (c) union non-emptiness — all computable
        # from the SORTED constituent lists without materializing the
        # union (whose sort dominated 1M-doc query latency):
        #   overlap     = sorted(tfidf ∩ union)      [membership probes]
        #   wm_unique   = first wm_limit non-overlap union ids; the
        #                 smallest (wm_limit + |overlap|) union ids are a
        #                 superset and each lies in some part's first
        #                 (wm_limit + |overlap|) elements, so clipped
        #                 heads suffice — exact, not approximate.
        tfidf_arr = np.fromiter(tfidf_internal, np.int64,
                                len(tfidf_internal))
        tfidf_arr.sort()
        member = np.zeros(tfidf_arr.size, bool)
        for p in wm_parts:
            if not p.size:
                continue
            j = np.searchsorted(p, tfidf_arr)
            jc = np.minimum(j, p.size - 1)
            member |= (j < p.size) & (p[jc] == tfidf_arr)
        wm_overlapping = tfidf_arr[member].tolist()
        wm_limit = max(0, coverage_depth - len(wm_overlapping)) \
            + DEPTH_RESERVE
        prior, wm_limit = self._assemble_prior(
            search_text, wm_limit, tfidf_arr, prefilter_mask, lim_ids,
            conj=self._conj_lookup(search_text, wm_groups))
        if has_wm:
            k_head = wm_limit + len(wm_overlapping)
            heads = _interleave_heads(wm_parts, k_head)
            outside = heads[~_in_sorted(heads, tfidf_arr)]
            if prior.size:
                outside = outside[~_in_sorted(outside, np.sort(prior))]
            wm_u = np.concatenate(
                [prior,
                 outside[: max(wm_limit - prior.size, WM_TAKE_MIN)]])
        else:
            wm_u = prior[:wm_limit]
        lim_tail = self._lim_tail(
            lim_ids, max(wm_limit - wm_u.size, LIM_TAKE_MIN),
            tfidf_arr, wm_u)
        if lim_tail.size:
            wm_u = np.concatenate([wm_u, lim_tail])
        wm_unique = wm_u.tolist()

        # Key index for LCS/word-hit memoization, over the docs that can
        # actually be scored (worklist members + Stage-1 candidates).
        unique_keys: Set[int] = {c.document_id for c in top_candidates}
        work_ids = np.asarray(wm_overlapping + wm_unique, dtype=np.int64)
        if work_ids.size:
            n_ids = model.doc_keys_arr.size
            valid = work_ids[(work_ids >= 0) & (work_ids < n_ids)]
            live = ~model.deleted_arr[valid]
            unique_keys.update(
                np.unique(model.doc_keys_arr[valid[live]]).tolist())
        key_to_index = {k: i for i, k in enumerate(unique_keys)}
        lcs_memo: Dict[int, int] = {}
        word_hits_memo: Dict[int, int] = {}

        final_scores: List[ScoreEntry] = []
        min_stem = model.tokenizer.min_index_size

        lcs_tolerance = 0
        if len(context.query) >= coverage_setup.coverage_q_limit_for_error_tolerance:
            lcs_tolerance = int(
                len(context.query)
                * coverage_setup.coverage_lcs_error_tolerance_relative_q)

        job: dict = dict(
            search_text=search_text,
            context=context,
            best_segments_map=best_segments_map,
            key_to_index=key_to_index,
            lcs_memo=lcs_memo,
            word_hits_memo=word_hits_memo,
            final_scores=final_scores,
            max_word_hits=0,
            # Only the zero/nonzero distinction is consumed downstream
            # (the zero-hit guard in _coverage_finish).
            wm_count=int(has_wm),
            lcs_tolerance=lcs_tolerance,
        )

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
            job["max_word_hits"] = max(job["max_word_hits"], features.word_hits)
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

        job["worklist"] = worklist
        job["best_segment_doc"] = best_segment_doc
        job["lcs_for"] = lcs_for
        job["process"] = process
        return job

    # ------------------------------------------------------------------
    # Vectorized (array) coverage path — semantics identical to the
    # entry-based methods above, minus per-candidate Python. Valid only
    # under _fast_path_ok() (1:1 id<->key, no synonym canonicalization).

    def _coverage_begin_fast(self, search_text: str,
                             coverage_setup: CoverageSetup,
                             coverage_depth: int,
                             s1: Stage1Arrays,
                             prefilter_mask=None,
                             lim_ids=None) -> dict:
        import time as _time

        model = self._model
        s1 = s1.truncated(coverage_depth)

        t0 = _time.perf_counter()
        wm_groups = self._wm_lookup_parts(
            search_text, coverage_setup.cover_prefix_suffix)
        if prefilter_mask is not None:
            wm_groups = [(w, [p[prefilter_mask[p]] for p in g])
                         for w, g in wm_groups]
        wm_parts = [p for _, g in wm_groups for p in g]
        has_wm = any(p.size for p in wm_parts)
        self._t_wm += _time.perf_counter() - t0

        t0 = _time.perf_counter()
        context = self._coverage_engine.prepare_query(search_text)
        self._t_prepq += _time.perf_counter() - t0

        # Overlap/unique partition from the sorted constituent lists —
        # see _coverage_begin for the equivalence argument.
        t0 = _time.perf_counter()
        tfidf_arr = np.sort(s1.iids)
        member = np.zeros(tfidf_arr.size, bool)
        for p in wm_parts:
            if not p.size:
                continue
            j = np.searchsorted(p, tfidf_arr)
            jc = np.minimum(j, p.size - 1)
            member |= (j < p.size) & (p[jc] == tfidf_arr)
        wm_overlapping = tfidf_arr[member]
        wm_limit = max(0, coverage_depth - int(wm_overlapping.size)) \
            + DEPTH_RESERVE
        prior, wm_limit = self._assemble_prior(
            search_text, wm_limit, tfidf_arr, prefilter_mask, lim_ids,
            conj=self._conj_lookup(search_text, wm_groups))
        self._t_prior += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        if has_wm:
            k_head = wm_limit + int(wm_overlapping.size)
            heads = _interleave_heads(wm_parts, k_head)
            outside = heads[~_in_sorted(heads, tfidf_arr)]
            if prior.size:
                outside = outside[~_in_sorted(outside, np.sort(prior))]
            wm_unique = np.concatenate(
                [prior,
                 outside[: max(wm_limit - prior.size, WM_TAKE_MIN)]])
        else:
            wm_unique = prior[:wm_limit]
        lim_tail = self._lim_tail(
            lim_ids, max(wm_limit - wm_unique.size, LIM_TAKE_MIN),
            tfidf_arr, wm_unique)
        if lim_tail.size:
            wm_unique = np.concatenate([wm_unique, lim_tail])
        self._t_heads += _time.perf_counter() - t0

        # Memo index space: one slot per distinct reachable document key.
        t0 = _time.perf_counter()
        wm_ids = np.concatenate([wm_overlapping, wm_unique]).astype(np.int64)
        n_ids = model.doc_keys_arr.size
        v = wm_ids[(wm_ids >= 0) & (wm_ids < n_ids)]
        if v.size:
            v = v[~model.deleted_arr[v]]
        sorted_keys = np.unique(np.concatenate(
            [s1.keys, model.doc_keys_arr[v]]))
        U = int(sorted_keys.size)

        max_tfidf = float(s1.scores[0]) if len(s1) else 1.0
        norm = (s1.scores / max_tfidf if max_tfidf > 0
                else np.zeros_like(s1.scores))
        worklist_ids = np.concatenate([wm_ids, s1.iids]).astype(np.int64)
        worklist_base = np.concatenate(
            [np.zeros(wm_ids.size, np.float32),
             norm.astype(np.float32)])

        lcs_tolerance = 0
        if len(context.query) >= coverage_setup.coverage_q_limit_for_error_tolerance:
            lcs_tolerance = int(
                len(context.query)
                * coverage_setup.coverage_lcs_error_tolerance_relative_q)
        self._t_memo += _time.perf_counter() - t0

        return dict(
            fast=True,
            search_text=search_text,
            context=context,
            sorted_keys=sorted_keys,
            lcs_memo_arr=np.zeros(U, np.int64),
            wh_memo_arr=np.zeros(U, np.int64),
            worklist_ids=worklist_ids,
            worklist_base=worklist_base,
            res_scores=[], res_ties=[], res_keys=[], res_idx=[],
            max_word_hits=0,
            wm_count=int(has_wm),
            lcs_tolerance=lcs_tolerance,
        )

    # ------------------------------------------------------------------
    def _resolve_candidates_fast(self, job: dict, enc: dict = None):
        """Vectorized _resolve_candidates: returns (chunk-array bundle,
        (leftover_ids, leftover_base)) — leftovers are table-overflow docs
        that the host oracle scores."""
        model = self._model
        tables = model.coverage_tables
        ids = job["worklist_ids"]
        base = job["worklist_base"]
        n_ids = model.doc_keys_arr.size

        ok = (ids >= 0) & (ids < n_ids)
        idc = np.where(ok, ids, 0)
        ok &= ~model.deleted_arr[idc]
        ovf = ok & tables.overflow[idc]
        dev = ok & ~ovf

        d_ids = ids[dev]
        d_base = base[dev]
        keys = model.doc_keys_arr[d_ids]
        idx = np.searchsorted(job["sorted_keys"], keys).astype(np.int64)

        # LCS per candidate, memoized per key slot; un-memoized slots get
        # ONE native batch call over first-occurrence texts. When the
        # kernel computes the fake-LCS on device (text_chars table +
        # eligible query), only device-ineligible docs need host values.
        lcs_memo = job["lcs_memo_arr"]
        vals = lcs_memo[idx]
        unmem = vals == 0
        if (enc is not None and enc.get("q_lcs_ok")
                and tables.lcs_ok_host is not None
                and model.sharded_tables is None):
            unmem &= ~tables.lcs_ok_host[d_ids]
        if unmem.any():
            u_idx, first = np.unique(idx[unmem], return_index=True)
            u_texts = model.norm_texts[d_ids[unmem][first]].tolist()
            q = job["context"].query
            tol = job["lcs_tolerance"]
            batch_lcs = _native_lcs_batch()
            if batch_lcs is not None:
                lv = np.asarray(batch_lcs(q, u_texts, tol,
                                          texts_lowered=True), np.int64)
            else:
                lv = np.fromiter(
                    (calculate_lcs(q, t, tol) for t in u_texts),
                    np.int64, len(u_texts))
            lcs_memo[u_idx] = np.minimum(lv, 255)
            vals = lcs_memo[idx]

        bundle = dict(ids=d_ids, base=d_base, idx=idx, keys=keys,
                      lcs=vals.astype(np.float32))
        return bundle, (ids[ovf], base[ovf])

    # ------------------------------------------------------------------
    def _host_score_fast(self, job: dict, ids: np.ndarray,
                         bases: np.ndarray) -> None:
        """Host-oracle scoring of fast-job candidates (overflow leftovers
        or whole ineligible worklists); mirrors the slow path's process()."""
        from .segment_processor import _normalized_text

        model = self._model
        context = job["context"]
        sorted_keys = job["sorted_keys"]
        lcs_memo = job["lcs_memo_arr"]
        wh_memo = job["wh_memo_arr"]
        min_stem = model.tokenizer.min_index_size
        normalizer = model.tokenizer.text_normalizer
        s_l: List[float] = []
        t_l: List[int] = []
        k_l: List[int] = []
        i_l: List[int] = []
        for ci, (iid, base) in enumerate(zip(ids.tolist(), bases.tolist())):
            if ci % 256 == 0 and _job_expired(job):
                break
            doc = model.documents.get_document(int(iid))
            if doc is None or doc.deleted:
                continue
            key = doc.document_key
            pos = int(np.searchsorted(sorted_keys, key))
            if pos >= sorted_keys.size or sorted_keys[pos] != key:
                continue
            doc_text = _normalized_text(doc, normalizer)
            lcs_val = int(lcs_memo[pos])
            if lcs_val == 0:
                lcs_val = min(calculate_lcs(context.query, doc_text,
                                            job["lcs_tolerance"]), 255)
                lcs_memo[pos] = lcs_val
            features = self._coverage_engine.calculate_features(
                context, doc_text, lcs_val, int(iid))
            score, tiebreaker = fusion_calculate(
                context.query, doc_text, features, float(base), min_stem)
            if wh_memo[pos] == 0:
                wh_memo[pos] = min(features.word_hits, 255)
            job["max_word_hits"] = max(job["max_word_hits"],
                                       features.word_hits)
            s_l.append(score)
            t_l.append(tiebreaker)
            k_l.append(key)
            i_l.append(pos)
        if s_l:
            job["res_scores"].append(np.asarray(s_l, np.float32))
            job["res_ties"].append(np.asarray(t_l, np.int64))
            job["res_keys"].append(np.asarray(k_l, np.int64))
            job["res_idx"].append(np.asarray(i_l, np.int64))

    # ------------------------------------------------------------------
    def _coverage_finish_fast(self, job: dict,
                              coverage_setup: CoverageSetup,
                              coverage_depth: int,
                              max_results: int) -> List[ScoreEntry]:
        if job["max_word_hits"] == 0 and job["wm_count"] == 0:
            return []
        if not job["res_scores"]:
            return []
        scores = np.concatenate(job["res_scores"])
        ties = np.concatenate(job["res_ties"])
        keys = np.concatenate(job["res_keys"])
        idx = np.concatenate(job["res_idx"])

        # TopKHeap order: score desc, tiebreaker desc, key asc.
        order = np.lexsort((keys, -ties, -scores))[:coverage_depth]
        k_sorted = keys[order]
        # consolidate_segments: best entry per key = first occurrence in
        # sorted order; keep sorted order among survivors.
        _, first = np.unique(k_sorted, return_index=True)
        first.sort()
        sel = order[first]

        f_scores = scores[sel]
        f_idx = idx[sel]

        truncation_index = -1
        if coverage_setup.truncate and sel.size:
            min_wh = max(
                coverage_setup.coverage_min_word_hits_abs,
                job["max_word_hits"]
                - coverage_setup.coverage_min_word_hits_relative)
            cond = ((job["wh_memo_arr"][f_idx] >= min_wh)
                    | (job["lcs_memo_arr"][f_idx] > 0)
                    | (f_scores >= coverage_setup.truncation_score))
            if cond.any():
                truncation_index = int(cond.size - 1
                                       - np.argmax(cond[::-1]))

        if truncation_index == -1 or not coverage_setup.truncate:
            result_count = max_results
        else:
            result_count = min(max(0, truncation_index) + 1, max_results)
        n_out = min(result_count, int(sel.size))
        out_sel = sel[:n_out]
        return [ScoreEntry(float(s), int(k), int(t))
                for s, k, t in zip(scores[out_sel].tolist(),
                                   keys[out_sel].tolist(),
                                   ties[out_sel].tolist())]

    # ------------------------------------------------------------------
    def _coverage_finish(self, job: dict, coverage_setup: CoverageSetup,
                         coverage_depth: int, max_results: int) -> List[ScoreEntry]:
        if job["max_word_hits"] == 0 and job["wm_count"] == 0:
            return []

        # Keep top coverage_depth (TopKHeap semantics) then consolidate.
        final_scores = job["final_scores"]
        final_scores.sort(key=lambda e: e.sort_key())
        final_results = consolidate_segments(final_scores[: coverage_depth])

        truncation_index = -1
        if coverage_setup.truncate and final_results:
            truncation_index = self._truncation_index(
                final_results, job["max_word_hits"], job["lcs_memo"],
                job["word_hits_memo"], job["key_to_index"], coverage_setup)

        if truncation_index == -1 or not coverage_setup.truncate:
            result_count = max_results
        else:
            result_count = min(max(0, truncation_index) + 1, max_results)
        return final_results[:result_count]

    # ------------------------------------------------------------------
    def _encode_job_query(self, job: dict) -> Optional[dict]:
        """Encode the job's query into the kernel's per-query arrays.

        Returns None when the query shape is ineligible (too many / too
        long tokens) and the host oracle should handle everything.
        """
        from ..coverage.engine import tokenize_slices
        from ..ops.coverage_kernel import (FQ_MAX, Q_MAX, encode_query_lcs,
                                           encode_query_tokens)

        model = self._model
        context = job["context"]
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
        q_maxlen = max(
            int(q_lens[:q_count].max()) if q_count else 0,
            int(fq_lens[:fq_count].max()) if fq_count else 0)
        qt_arr, qt_len, qt_ok = encode_query_lcs(context.query.lower())
        return dict(q_chars=q_chars, q_rev=q_rev, q_lens=q_lens, q_idf=q_idf,
                    q_widf=q_widf, q_count=np.int32(q_count), q_sorted=q_sorted,
                    fq_chars=fq_chars, fq_rev=fq_rev, fq_lens=fq_lens,
                    fq_count=np.int32(fq_count), last_alpha=last_alpha,
                    query_len=np.int32(len(context.query)),
                    q_maxlen=q_maxlen,
                    qtext=qt_arr, qtext_len=qt_len,
                    q_lcs_tol=np.int32(job["lcs_tolerance"]),
                    q_lcs_ok=qt_ok)

    # ------------------------------------------------------------------
    def _resolve_candidates(self, job: dict):
        """Split the job's worklist into device candidates (with memoized
        LCS) and host-oracle leftovers (segment mismatch / table overflow).

        LCS values for un-memoized candidates are computed in ONE native
        batch call when the C++ library is available (native/_lib.cpp)."""
        model = self._model
        tables = model.coverage_tables
        context = job["context"]
        device_cands = []   # (text_id, base_score, idx, doc_key, lcs)
        leftovers = []
        best_segment_doc = job["best_segment_doc"]
        best_segments_map = job["best_segments_map"]
        key_to_index = job["key_to_index"]
        lcs_for = job["lcs_for"]
        lcs_memo = job["lcs_memo"]
        batch_lcs = _native_lcs_batch()
        need_slots: List[int] = []
        need_idx: List[int] = []
        need_texts: List[str] = []
        seen_idx: Set[int] = set()
        for internal_id, base_score in job["worklist"]:
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
            if batch_lcs is None:
                lcs_val = lcs_for(idx, context.query, doc_text)
            else:
                lcs_val = lcs_memo.get(idx, 0)
                if lcs_val == 0 and idx not in seen_idx:
                    seen_idx.add(idx)
                    need_slots.append(len(device_cands))
                    need_idx.append(idx)
                    need_texts.append(doc_text)
            device_cands.append(
                (text_doc.id, base_score, idx, doc.document_key, lcs_val))
        if batch_lcs is not None and need_texts:
            vals = batch_lcs(context.query, need_texts,
                             job["lcs_tolerance"])
            for slot, idx, v in zip(need_slots, need_idx, vals.tolist()):
                lcs_memo[idx] = min(int(v), 255)
            # patch candidates that used the placeholder 0
            device_cands = [
                (tid, b, idx, key,
                 lv if lv else lcs_memo.get(idx, 0))
                for (tid, b, idx, key, lv) in device_cands]
        return device_cands, leftovers

    # ------------------------------------------------------------------
    @staticmethod
    def _stack_wave(encs: List[dict], l_cap: Optional[int] = None) -> tuple:
        """Stack COVERAGE_B_PAD encoded queries into the kernel's [B, ...]
        argument arrays (built once per wave, reused by every chunk).

        The query-token axes are bucketed to {4, Q_MAX}: almost every
        tensor in the kernel carries a Q (or FQ) dimension, so a wave of
        short queries compiles to a program with 4x less work on that
        axis. ``l_cap`` additionally truncates the char axis (the small
        bucket runs at L_CAP_SMALL; only candidates whose query AND doc
        words fit are routed there). Few buckets keep compile counts tiny.
        """
        from ..ops.coverage_kernel import FQ_MAX, L_MAX, Q_MAX

        max_q = max(int(e["q_count"]) for e in encs)
        max_fq = max(int(e["fq_count"]) for e in encs)
        q_pad = 4 if max_q <= 4 else Q_MAX
        fq_pad = 4 if max_fq <= 4 else FQ_MAX
        l_cap = l_cap or L_MAX

        stk_q = lambda key: np.stack([e[key][:q_pad] for e in encs])
        stk_qc = lambda key: np.stack([e[key][:q_pad, :l_cap] for e in encs])
        stk_fq = lambda key: np.stack([e[key][:fq_pad] for e in encs])
        stk_fqc = lambda key: np.stack([e[key][:fq_pad, :l_cap] for e in encs])
        q_args = (
            stk_qc("q_chars"), stk_qc("q_rev"), stk_q("q_lens"),
            stk_q("q_idf"), stk_q("q_widf"),
            np.array([e["q_count"] for e in encs], np.int32),
            stk_q("q_sorted"),
            stk_fqc("fq_chars"), stk_fqc("fq_rev"), stk_fq("fq_lens"),
            np.array([e["fq_count"] for e in encs], np.int32),
            np.array([e["last_alpha"] for e in encs], np.bool_),
        )
        qlen_arg = np.array([e["query_len"] for e in encs], np.int32)
        # Query-char axis of the device LCS bucketed to {16, QT_LCS}:
        # nearly every wave's longest query fits 16 chars, quartering the
        # containment scan's per-trip compare work.
        qt_lens = np.array([e["qtext_len"] for e in encs], np.int32)
        qt_pad = 16 if int(qt_lens.max(initial=0)) <= 16 else None
        lcs_args = (
            np.stack([e["qtext"][:qt_pad] for e in encs]),
            qt_lens,
            np.array([e["q_lcs_tol"] for e in encs], np.int32),
            np.array([e["q_lcs_ok"] for e in encs], np.bool_),
        )
        return q_args, qlen_arg, lcs_args

    # ------------------------------------------------------------------
    def _dispatch_chunk(self, ids: np.ndarray, qsel: np.ndarray,
                        base: np.ndarray, lcs_v: np.ndarray,
                        wave_args: tuple, config):
        """Launch ONE coverage-kernel call for up to DEVICE_COVERAGE_CHUNK
        candidates (async — returns the device output for collection)."""
        from ..ops.coverage_kernel import coverage_fusion_batch

        tables = self._model.coverage_tables
        q_args, qlen_arg, lcs_args = wave_args
        n = int(ids.size)
        # doubling sub-buckets keep partial chunks cheap (pad rows cost
        # REAL kernel work — they park on a live query — so padding is
        # the dominant per-chunk waste; _chunk_sizes splits big partials)
        c_pad = DEVICE_COVERAGE_CHUNK_MIN
        while c_pad < n:
            c_pad *= 2
        c_pad = min(c_pad, DEVICE_COVERAGE_CHUNK)
        text_ids = np.zeros(c_pad, np.int32)
        text_ids[:n] = ids
        # Park pad rows on the chunk's own last query so padding never
        # widens the kernel's dynamic loop bounds.
        qs = np.full(c_pad, qsel[n - 1] if n else 0, np.int32)
        qs[:n] = qsel
        b_arr = np.zeros(c_pad, np.float32)
        b_arr[:n] = base
        lcs_arr = np.zeros(c_pad, np.float32)
        lcs_arr[:n] = lcs_v

        if self._model.sharded_tables is not None:
            from ..parallel.sharding import sharded_coverage_batch

            # Mesh path: synchronous (host routes candidates to their
            # owning shard and stitches the order back) — returns numpy,
            # which _device_collect passes through untransferred.
            return sharded_coverage_batch(
                self._model.sharded_tables, text_ids, qs, q_args, lcs_arr,
                b_arr, qlen_arg, config)

        if tables.text_chars is not None:
            return coverage_fusion_batch(
                tables.word_chars, tables.word_chars_rev, tables.word_lens,
                tables.doc_tokens, tables.doc_tok_offsets,
                tables.doc_tok_count, tables.doc_adj_ws,
                tables.doc_text_len, text_ids, qs, *q_args,
                lcs_arr, b_arr, qlen_arg,
                tables.text_chars, tables.lcs_ok, *lcs_args, config=config)
        return coverage_fusion_batch(
            tables.word_chars, tables.word_chars_rev, tables.word_lens,
            tables.doc_tokens, tables.doc_tok_offsets,
            tables.doc_tok_count, tables.doc_adj_ws,
            tables.doc_text_len, text_ids, qs, *q_args,
            lcs_arr, b_arr, qlen_arg, config=config)

    # ------------------------------------------------------------------
    def _device_collect(self, pending: List[tuple]) -> None:
        """Read back dispatched coverage chunks (one packed transfer per
        chunk; transfers overlap still-running later chunks) and route each
        row group to its owning job."""
        import time as _time

        import jax

        for out, qsel, idx, keys, n, wave_jobs in pending:
            t0w = _time.perf_counter()
            packed = jax.device_get(out)
            self.device_wait_s += _time.perf_counter() - t0w
            self.device_calls += 1
            score = packed[0][:n]
            if len(packed) == 2:
                # device-LCS layout: one f32 row = tie<<16 | wh<<8 | lcs
                meta = packed[1][:n].astype(np.int64)
                tie = meta >> 16
                wh = (meta >> 8) & 255
                lcs_row = meta & 255
            else:
                tie = packed[1][:n]
                wh = packed[2][:n]
                lcs_row = None
            order = np.argsort(qsel, kind="stable")
            sq = qsel[order]
            uq, starts = np.unique(sq, return_index=True)
            bounds = np.append(starts, n)
            for g, qi in enumerate(uq.tolist()):
                rows = order[bounds[g]:bounds[g + 1]]
                job = wave_jobs[qi]
                g_wh = wh[rows]
                g_idx = idx[rows]
                if job.get("fast"):
                    job["max_word_hits"] = max(
                        job["max_word_hits"], int(g_wh.max()))
                    memo = job["wh_memo_arr"]
                    zero = memo[g_idx] == 0
                    memo[g_idx[zero]] = np.minimum(
                        g_wh[zero].astype(np.int64), 255)
                    if lcs_row is not None:
                        # device-LCS builds: fill the truncation memo
                        # (finish_fast reads lcs_memo_arr > 0)
                        lmemo = job["lcs_memo_arr"]
                        g_lcs = lcs_row[rows]
                        lz = lmemo[g_idx] == 0
                        lmemo[g_idx[lz]] = g_lcs[lz]
                    job["res_scores"].append(score[rows].astype(np.float32))
                    job["res_ties"].append(tie[rows].astype(np.int64))
                    job["res_keys"].append(keys[rows])
                    job["res_idx"].append(g_idx)
                else:
                    whm = job["word_hits_memo"]
                    fs = job["final_scores"]
                    mwh = job["max_word_hits"]
                    for r in rows.tolist():
                        hits = int(wh[r])
                        ix = int(idx[r])
                        if whm.get(ix, 0) == 0:
                            whm[ix] = min(hits, 255)
                        if hits > mwh:
                            mwh = hits
                        fs.append(ScoreEntry(float(score[r]), int(keys[r]),
                                             int(tie[r])))
                    job["max_word_hits"] = mwh

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
