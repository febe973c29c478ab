"""Memory-bounded segment serving: flushed postings stay on disk.

Behavioral reference: Infidex ``Indexing/Segments/MMapBlockPostingsEnum.cs``
(:1-303) and ``SegmentReader.cs:33-125`` — the reference serves flushed
segments directly from the memory-mapped block-postings file, decoding only
the blocks a query touches, so resident memory is bounded by the live
in-memory delta index + per-query working set, not the corpus.

``flush(path, materialize=False)`` puts the engine in this mode: the
unified CSR is built from the MEMORY postings only (docs added after the
flush), the vocabulary/df image is the union of memory + segment terms
(so idf and fuzzy LD1 matching see the whole corpus), and Stage-1 runs on
the host by lazily decoding exactly the query's terms' blocks from each
segment. Doc spaces are disjoint (segment docs precede the flush point),
so the per-source top-k lists merge exactly.

This mode trades throughput for bounded memory — the headline serving
path remains the HBM-resident unified CSR (``flush(materialize=True)``,
the default), where the whole corpus scores in one device scatter.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .device import B, DELTA, K1, compute_idf


class MmapStage1:
    """Host Stage-1 over (memory CSR + lazily-decoded segment blocks).

    Implements the ``DeviceIndex.search_batch`` interface so the pipeline
    is agnostic to the serving mode."""

    def __init__(self, model):
        self._model = model

    # ------------------------------------------------------------------
    def _term_parts(self, tid: int) -> List[Tuple[np.ndarray, np.ndarray]]:
        """(doc_ids, weights) arrays for one union term id: the memory CSR
        slice plus one lazily-decoded part per segment containing it."""
        model = self._model
        built = model.built
        parts: List[Tuple[np.ndarray, np.ndarray]] = []
        s, e = int(built.term_offsets[tid]), int(built.term_offsets[tid + 1])
        if e > s:
            parts.append((built.postings_docs[s:e],
                          built.postings_weights[s:e]))
        for seg, ordinal in model._segment_catalog.get(tid, ()):
            docs, weights = seg.get_postings_by_ordinal(ordinal, True)
            parts.append((docs.astype(np.int64), weights))
        return parts

    # ------------------------------------------------------------------
    def search_batch(self, queries, top_k: int, total_docs=None,
                     stop_term_limit: int = 1_250_000,
                     live_override=None, host_mask=None) -> list:
        """Same output convention as ``DeviceIndex.search_batch``:
        [(scores f32[k], ids int32[k])] per query, score-descending,
        non-positive score = padding. ``live_override`` (device-side
        pre-filter buffer) is ignored — pass the numpy ``host_mask``
        instead to pre-filter on this path."""
        td = int(total_docs if total_docs is not None
                 else self._model.documents.count)
        return [self._search_one(prep, top_k, td, stop_term_limit,
                                 host_mask=host_mask)
                for prep in queries]

    def _search_one(self, prep, top_k: int, total_docs: int,
                    stop_limit: int, host_mask=None):
        model = self._model
        built = model.built
        term_ids, idfs, fuzzy_groups = prep
        n = built.doc_lengths.size
        avgdl = np.float32(max(built.avgdl, 1e-9))
        dl = built.doc_lengths
        dl = np.where(dl <= 0.0, np.float32(1.0), dl)
        norm = np.float32(K1) * (np.float32(1.0 - B)
                                 + np.float32(B) * (dl / avgdl))
        scores = np.zeros(n, np.float32)
        cnt = np.zeros(n, np.int32)   # distinct-scoring-term count
        fz_any = np.zeros(n, bool)    # carries any fuzzy-matched word

        for tid, idf in zip(np.asarray(term_ids, np.int64), idfs):
            if float(idf) <= 0.0:
                continue
            for docs, weights in self._term_parts(int(tid)):
                d = docs.astype(np.int64)
                tf = weights.astype(np.float32)
                contrib = np.float32(idf) * (
                    (tf * np.float32(K1 + 1.0)) / (tf + norm[d])
                    + np.float32(DELTA))
                np.add.at(scores, d, contrib)
                np.add.at(cnt, d, 1)

        for grp in (fuzzy_groups or ()):
            # virtual term: union of matched terms' docs, tf = 1.0
            # (VectorModel.ExpandMissingTerm; device twin: _fuzzy_block)
            chunks = [docs for tid in np.asarray(grp, np.int64)
                      for docs, _ in self._term_parts(int(tid))]
            if not chunks:
                continue
            union = np.unique(np.concatenate(chunks)).astype(np.int64)
            df = int(union.size)
            if df <= 0 or df > stop_limit:
                continue
            fidf = compute_idf(total_docs, df)
            contrib = np.float32(fidf) * (
                np.float32(K1 + 1.0) / (np.float32(1.0) + norm[union])
                + np.float32(DELTA))
            scores[union] += contrib
            if fidf > 0.0:
                cnt[union] += 1
                fz_any[union] = True

        if model.deleted_arr.size >= n:
            scores[model.deleted_arr[:n]] = 0.0
            cnt[model.deleted_arr[:n]] = 0
            fz_any[model.deleted_arr[:n]] = False
        if host_mask is not None and host_mask.size >= n:
            scores[~host_mask[:n]] = 0.0
            cnt[~host_mask[:n]] = 0
            fz_any[~host_mask[:n]] = False

        k = min(int(top_k), n)
        if k <= 0:
            return (np.zeros(0, np.float32), np.zeros(0, np.int32),
                    np.zeros(0, np.int32))
        idx = np.argpartition(-scores, k - 1)[:k] if k < n \
            else np.arange(n)
        order = np.lexsort((idx, -scores[idx]))   # desc, lower id wins tie
        out_scores = np.zeros(k, np.float32)
        out_ids = np.zeros(k, np.int32)
        out_scores[: order.size] = scores[idx[order]]
        out_ids[: order.size] = idx[order]
        # low-id matchers (device.py LIM rows, host twin): lowest ids of
        # the max-gram-coverage class UNION the fuzzy-matched-word class
        from .device import LIM_K, LIM_WINDOW

        w = min(LIM_WINDOW, n)
        cmax = int(cnt[:w].max()) if w else 0
        m = fz_any[:w]
        if cmax > 0:
            m = m | (cnt[:w] == cmax)
        lim = np.flatnonzero(m)[: min(LIM_K, k)]
        return out_scores, out_ids, lim.astype(np.int32)


def build_union_index(model, n_docs: int):
    """Union BuiltIndex for mmap serving: memory-postings CSR + the full
    memory∪segment vocabulary with GLOBAL df (idf and fuzzy matching see
    the whole corpus; segment-only terms carry empty CSR ranges). Also
    installs ``model._segment_catalog`` (union tid -> [(reader, ordinal)]).
    """
    from .builder import BuiltIndex, finalize_postings

    mem = finalize_postings(model.term_dict, n_docs)

    terms = list(mem.terms)
    term_to_id = dict(mem.term_to_id)
    dfs = mem.df.astype(np.int64).tolist()
    catalog: Dict[int, list] = {}
    for seg in model._segments:
        for term, ordinal in seg.iter_terms():
            t = term_to_id.get(term)
            if t is None:
                t = len(terms)
                term_to_id[term] = t
                terms.append(term)
                dfs.append(0)
            if dfs[t] >= 0:   # -1 = stop term: df stays pinned
                dfs[t] += int(seg.dfs[ordinal])
            catalog.setdefault(t, []).append((seg, ordinal))
    model._segment_catalog = catalog

    T = len(terms)
    offsets = np.zeros(T + 1, np.int64)
    offsets[: mem.term_offsets.size] = mem.term_offsets
    offsets[mem.term_offsets.size:] = mem.term_offsets[-1]

    # doc lengths: flushed docs' lengths were captured at flush time;
    # memory docs' lengths come from the live postings.
    dl = np.zeros(max(n_docs, 1), np.float32)
    fl = model._flushed_doc_lengths
    dl[: min(fl.size, n_docs)] = fl[: min(fl.size, n_docs)]
    ml = mem.doc_lengths
    k = min(ml.size, n_docs)
    dl[:k] += ml[:k]
    dl = dl[:n_docs]
    avgdl = float(dl.mean()) if n_docs > 0 else 0.0

    return BuiltIndex(
        terms=terms, term_to_id=term_to_id, term_offsets=offsets,
        postings_docs=mem.postings_docs,
        postings_weights=mem.postings_weights,
        df=np.asarray(dfs, np.int64).clip(-1, 2**31 - 1).astype(np.int32),
        doc_lengths=dl, avgdl=avgdl, num_docs=n_docs)
