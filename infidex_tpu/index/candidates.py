"""Tiered candidate selection + pool scoring over the CSR postings.

Behavioral reference: Infidex ``Scoring/TieredCandidateSelector.cs``
(533 LoC): (0) positional-prefix precedence for strong prefixes;
(1) disjunctive union when a typo is suspected (df < 10), terms are
missing, or the query is single-term; else tiered AND — all-terms
intersection (leapfrog), then n-1 terms, then <= 2 selective high-IDF terms
(idf >= 0.3 * max), with cardinality early-exits at top_k * {2, 3, 5, 10}.

Routing is driven by the measured TPU cost model (scripts/
profile_stage1.py on the real chip): the device full-disjunction kernel
costs ~35ms of link latency + ~12ns/lane of XLA scatter, so a
multi-term query over a large corpus (n-gram dfs in the 10^5 range,
10^6+ lanes) pays 100s of ms per batch — while the tiered AND runs in
~1ms/query of numpy set ops and the exact BM25 of a topK*10 pool costs
~3ms/query of searchsorted joins, both GIL-releasing and threadable.
Small corpora, single-term, fuzzy and typo-suspect queries stay on the
dense device path (exact full disjunction, the same trade the reference
makes at TieredCandidateSelector.cs:108-124).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

TYPO_SUSPECT_DF = 10
IDF_SELECTIVE_FRACTION = 0.3
TIER_EXITS = (2, 3, 5, 10)

#: per-query posting-lane count above which the tiered host path takes
#: over from the device full disjunction (0 disables tiering entirely).
#: 32k lanes ~ the break-even measured on the tunneled chip: the host
#: tier+pool-score costs ~3-4ms/query on a thread that overlaps the
#: device call, while every device lane costs ~12ns of XLA scatter plus
#: its share of the l_pad bucket padding.
TIER_LANE_BUDGET = int(os.environ.get("INFIDEX_TPU_TIER_LANES", 32_768))


def _ordered_isect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two SORTED-UNIQUE arrays via binary search of the
    smaller in the larger — O(m log n) with no sort, vs intersect1d's
    sort of the concatenation. Postings are doc-sorted unique, and the
    rarest-first tier loop keeps the running intersection tiny, so this
    is the tier hot loop's main win (~5x at 10^5-df terms)."""
    small, big = (a, b) if a.size <= b.size else (b, a)
    if small.size == 0 or big.size == 0:
        return small[:0]
    pos = np.searchsorted(big, small)
    pos_c = np.minimum(pos, big.size - 1)
    return small[big[pos_c] == small]


def top_weight_idx(w: np.ndarray, cap: int) -> np.ndarray:
    """Positions of the ``cap`` largest uint8 weights, ties resolved
    toward LOWER position, returned position-ascending. One bincount +
    one boolean pass (O(n), no sort) — and, unlike argpartition, a
    DETERMINISTIC rule the native twin (infidex_tier_select champions)
    reproduces bit-for-bit."""
    hist = np.bincount(w, minlength=256)
    cum = hist[::-1].cumsum()[::-1]       # cum[v] = count(weight >= v)
    ge_cap = cum >= cap
    wt = int(np.nonzero(ge_cap)[0][-1]) if ge_cap.any() else 0
    n_above = int(cum[wt + 1]) if wt < 255 else 0
    idx = np.nonzero(w >= wt)[0]
    eq = w[idx] == wt
    keep = ~eq | (np.cumsum(eq) <= cap - n_above)
    return idx[keep]


class TieredCandidateSelector:
    """Candidate-doc generation with tiered intersection early-exits."""

    def __init__(self, built):
        self.built = built

    def _postings(self, term_id: int) -> np.ndarray:
        s = self.built.term_offsets[term_id]
        e = self.built.term_offsets[term_id + 1]
        return self.built.postings_docs[s:e]

    def _champions(self, term_id: int, cap: int) -> np.ndarray:
        """The term's *cap* best docs by posting weight (byte-quantized tf;
        BM25 is monotone in tf, so these are its likeliest top scorers).
        Ties broken toward lower doc ids, like every other ordering here."""
        s = int(self.built.term_offsets[term_id])
        e = int(self.built.term_offsets[term_id + 1])
        docs = self.built.postings_docs[s:e]
        if docs.size <= cap:
            return docs
        w = self.built.postings_weights[s:e]
        return docs[top_weight_idx(w, cap)]

    def select(self, term_ids: List[int], term_idf: List[float],
               top_k: int, want_union: bool = True) -> Tuple[np.ndarray, str]:
        """Returns (candidate doc ids ascending, tier label).

        Tier labels: "union" | "all" | "all-minus-one" | "selective".
        The non-union pools are bounded by ~4 * top_k * 10 docs: the
        all-terms AND (early-exit cap, lowest ids — the reference's
        enumeration-order exit), the rarest term's weight champions (its
        idf dominates BM25, so docs carrying it are the likely disjunction
        winners even when they miss a common term), plus widening tiers on
        shortfall (n-1 AND, <=2 selective high-IDF champion lists)."""
        built = self.built
        live = [(t, i) for t, i in zip(term_ids, term_idf)
                if t >= 0 and built.df[t] > 0]
        if not live:
            return np.zeros(0, np.int64), "union"

        dfs = [int(built.df[t]) for t, _ in live]
        missing = len(live) < len(term_ids)
        typo_suspect = any(d < TYPO_SUSPECT_DF for d in dfs)

        # Disjunctive union (TieredCandidateSelector.cs:108-124)
        if len(live) == 1 or missing or typo_suspect:
            if not want_union:
                # TieredStage1 routes union queries to the dense device
                # kernel and discards the pool — skip materializing a
                # 10^5-10^6-id unique/concat per query.
                return np.zeros(0, np.int64), "union"
            parts = [self._postings(t) for t, _ in live]
            return np.unique(np.concatenate(parts)), "union"

        cap = top_k * TIER_EXITS[3]
        # stable: df ties keep query-term order — the native twin
        # replicates the ordering, so both paths build identical pools.
        order = np.argsort(dfs, kind="stable")

        from .. import native as _nat

        if _nat.available:
            ordered = np.array([live[oi][0] for oi in order], np.int64)
            max_idf = max(i for _, i in live)
            selective = [t for t, i in live
                         if i >= IDF_SELECTIVE_FRACTION * max_idf]
            selective.sort(key=lambda t: int(built.df[t]))
            pool, label = _nat.tier_select(
                built.term_offsets, built.postings_docs,
                built.postings_weights, ordered,
                np.array(selective[:2], np.int64), top_k,
                generation=getattr(built, "gen", 0))
            return pool, label

        # Tier 1: all-terms intersection, rarest first (leapfrog analogue)
        inter = self._postings(live[order[0]][0])
        for oi in order[1:]:
            inter = _ordered_isect(inter, self._postings(live[oi][0]))
            if inter.size == 0:
                break
        parts = [inter[:cap], self._champions(live[order[0]][0], cap)]
        merged = np.unique(np.concatenate(parts))
        if inter.size >= top_k * TIER_EXITS[0]:
            return merged, "all"

        # Tier 2: n-1 terms (drop the rarest — the likeliest typo)
        if len(live) >= 3:
            inter2 = self._postings(live[order[1]][0])
            for oi in order[2:]:
                inter2 = _ordered_isect(inter2,
                                        self._postings(live[oi][0]))
                if inter2.size == 0:
                    break
            parts.append(inter2[:cap])
            merged = np.unique(np.concatenate(parts))
            if merged.size >= top_k * TIER_EXITS[1]:
                return merged, "all-minus-one"

        # Tier 3: <= 2 selective high-IDF terms
        max_idf = max(i for _, i in live)
        selective = [t for t, i in live
                     if i >= IDF_SELECTIVE_FRACTION * max_idf]
        selective.sort(key=lambda t: int(built.df[t]))
        for t in selective[:2]:
            parts.append(self._champions(t, cap))
            merged = np.unique(np.concatenate(parts))
            if merged.size >= top_k * TIER_EXITS[3]:
                return merged, "selective"
        return merged, "selective"


def top_desc_idx(scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the ``k`` largest f32 scores, ordered (score desc,
    index asc) — exactly ``np.argsort(-scores, kind="stable")[:k]`` but
    O(n + k log k): scores pack with their index into one strictly-
    ordered uint64 key, argpartition selects, and only the k winners
    sort. Replaces the former full-pool stable argsort in the tier hot
    path (~0.3ms/query at 5k-doc pools, 1M corpus).

    Caveat: the bit-trick total order differs from argsort for NaN
    (NaNs sort as huge magnitudes, not last) — unreachable from BM25+
    scores, which are finite by construction."""
    scores = np.ascontiguousarray(scores, np.float32)
    n = scores.size
    if n <= k:
        return np.argsort(-scores, kind="stable")
    # monotone f32 -> uint32 map (sign-flip trick), inverted for desc
    bits = scores.view(np.uint32)
    asc = np.where(bits & 0x80000000, ~bits, bits | np.uint32(0x80000000))
    key = ((~asc).astype(np.uint64) << np.uint64(32)) | np.arange(
        n, dtype=np.uint64)
    part = np.argpartition(key, k)[:k]
    winners = part[np.argsort(key[part])]
    return winners.astype(np.int64)


def score_pool(built, term_ids, term_idf, pool: np.ndarray) -> np.ndarray:
    """Exact BM25+ of *pool* docs over the query terms (f32, device math).

    Identical formula to ``index/device.py`` ``_stage1_kernel``: tf joined
    per term via searchsorted over the doc-sorted CSR postings; a term
    contributes only where the doc actually carries it (tf > 0). Routes
    to the native C twin when available (bit-identical f32 op order;
    ~3x on the 1-CPU bench host where this is the tier hot loop)."""
    from .device import B, DELTA, K1

    if pool.size == 0:
        return np.zeros(0, np.float32)
    try:
        from .. import native as _nat
        if _nat.available:
            return _nat.score_pool_native(
                built.term_offsets, built.postings_docs,
                built.postings_weights, built.doc_lengths,
                max(built.avgdl, 1e-9), term_ids, term_idf,
                np.ascontiguousarray(pool, np.int64))
    except Exception:  # pragma: no cover - fall back to numpy
        pass
    avgdl = np.float32(max(built.avgdl, 1e-9))
    dl = built.doc_lengths[pool].astype(np.float32)
    dl = np.where(dl <= 0.0, np.float32(1.0), dl)
    norm = np.float32(K1) * (np.float32(1.0 - B) + np.float32(B) * (dl / avgdl))
    scores = np.zeros(pool.size, np.float32)
    offsets = built.term_offsets
    docs = built.postings_docs
    weights = built.postings_weights
    for tid, idf in zip(term_ids, term_idf):
        s, e = int(offsets[tid]), int(offsets[tid + 1])
        p = docs[s:e]
        if p.size == 0:
            continue
        pos = np.searchsorted(p, pool)
        pos_c = np.minimum(pos, p.size - 1)
        found = p[pos_c] == pool
        tf = np.where(found, weights[s + pos_c], 0).astype(np.float32)
        contrib = np.float32(idf) * (
            (tf * np.float32(K1 + 1.0)) / (tf + norm) + np.float32(DELTA))
        scores += np.where(found, contrib, np.float32(0.0))
    return scores


class TieredStage1:
    """Host Stage-1 for large-corpus multi-term queries.

    ``run`` returns (scores f32[top_k], ids int32[top_k]) in the device
    kernel's output convention (score-descending, lower id wins ties,
    non-positive score = padding), or None when the query must ride the
    dense device path (union tier / disabled / empty pool)."""

    def __init__(self, built, deleted_arr: Optional[np.ndarray] = None):
        self.built = built
        self.deleted_arr = deleted_arr
        self._selector = TieredCandidateSelector(built)
        self._mask_sel_cache: dict = {}

    @staticmethod
    def _deep_masked_enabled() -> bool:
        """Default ON (A/B on the real chip at 1M, scripts/c4_masked_ab
        .py, ABA same-session: deep=0 124.5/126.5 QPS with 742ms/batch
        of dense masked device passes; deep=1 203.1 QPS at 253ms/batch
        — the config-4 gap to config-2 closed from ~40% to ~6%)."""
        return os.environ.get("INFIDEX_TPU_MASKED_TIER_DEEP", "1") == "1"

    def _mask_selectivity(self, mask) -> float:
        """Fraction of docs the mask keeps, cached per mask object (the
        engine caches masks per compiled filter, so ids are stable)."""
        key = id(mask)
        hit = self._mask_sel_cache.get(key)
        if hit is not None and hit[0] is mask:
            return hit[1]
        frac = float(np.count_nonzero(mask)) / max(mask.size, 1)
        if len(self._mask_sel_cache) >= 16:
            self._mask_sel_cache.clear()
        self._mask_sel_cache[key] = (mask, frac)
        return frac

    def applicable(self, term_ids, fuzzy_groups) -> bool:
        if TIER_LANE_BUDGET <= 0 or len(term_ids) < 2 or fuzzy_groups:
            return False
        df = self.built.df
        lanes = int(sum(int(df[t]) for t in term_ids))
        return lanes > TIER_LANE_BUDGET

    def select_pool(self, term_ids, term_idf, top_k: int, mask=None):
        """Candidate pool only (no scoring): (pool int64 asc, lim_ids)
        or None when the query must ride the dense device path. The
        scoring half runs either on host (``run``) or on device
        (``DeviceIndex.pool_score_dispatch``) — identical results."""
        pool, tier = self._selector.select(
            [int(t) for t in term_ids], [float(i) for i in term_idf], top_k,
            want_union=False)
        if tier == "union" or pool.size == 0:
            return None
        if self.deleted_arr is not None and self.deleted_arr.size:
            pool = pool[~self.deleted_arr[pool]]
        if mask is not None:
            # pre-filter: the pool was chosen without mask knowledge, so a
            # heavily-filtered pool may miss matching docs deeper in the
            # postings — fall back to the masked device disjunction, which
            # is exact, whenever the surviving pool cannot fill top_k.
            pool = pool[mask[pool]] if mask.size >= self.built.num_docs \
                else pool[:0]
            if pool.size < top_k and self._deep_masked_enabled():
                # Mask-aware deep walk (round-5 config-4 diagnosis: a
                # 9.3%-selective filter underfills the 10x-top_k pool,
                # routing ~every tier query to the 751ms/batch dense
                # masked device pass). Re-select with top_k scaled by
                # 1/selectivity so the post-mask survivors can fill the
                # page; the exact BM25 rerank over the (larger) pool and
                # the underfill fallback below are unchanged. The pool
                # approximation quality matches the unmasked tier's (the
                # dense fallback is champion-clipped too); A/B numbers in
                # _deep_masked_enabled. INFIDEX_TPU_MASKED_TIER_DEEP=0
                # restores the always-dense fallback.
                sel_frac = self._mask_selectivity(mask)
                scaled_k = min(int(top_k / max(sel_frac, 0.005)) + 1,
                               top_k * 64)
                pool2, tier2 = self._selector.select(
                    [int(t) for t in term_ids],
                    [float(i) for i in term_idf], scaled_k,
                    want_union=False)
                if tier2 != "union" and pool2.size:
                    if (self.deleted_arr is not None
                            and self.deleted_arr.size):
                        pool2 = pool2[~self.deleted_arr[pool2]]
                    pool = pool2[mask[pool2]]
            if pool.size < top_k:
                return None
        if pool.size == 0:
            return None
        return pool, self._lim_ids(term_ids, term_idf, mask)

    def run(self, term_ids, term_idf, top_k: int, mask=None):
        sel = self.select_pool(term_ids, term_idf, top_k, mask=mask)
        if sel is None:
            return None
        pool, lim = sel
        scores = score_pool(self.built, term_ids, term_idf, pool)
        order = top_desc_idx(scores, top_k)
        out_scores = np.zeros(top_k, np.float32)
        out_ids = np.zeros(top_k, np.int32)
        out_scores[: order.size] = scores[order]
        out_ids[: order.size] = pool[order]
        return out_scores, out_ids, lim

    def run_batch(self, preps, top_k: int):
        """Whole-batch ``run`` in ONE native call (no mask support —
        callers with a pre-filter mask use the per-query path).

        ``preps`` = [(term_ids, idfs, fuzzy_groups), ...]; returns a list
        aligned with preps whose entries are (scores, ids, lim) — the
        ``run`` convention — or None (union route / empty pool / not
        applicable: ride the device path). Bit-identical to per-query
        ``run``: selection, deleted filter, BM25 f32 op order and the
        (score desc, id asc) top-k rule all replicate inside
        native/_lib.cpp infidex_tier_batch."""
        from .. import native as _nat

        if not _nat.available:
            return [self.run(t, i, top_k) if self.applicable(t, f) else None
                    for t, i, f in preps]
        queries = []
        live_idx = []
        out: list = [None] * len(preps)
        for qi, (term_ids, idfs, fuzzy_groups) in enumerate(preps):
            if not self.applicable(term_ids, fuzzy_groups):
                continue
            queries.append(([int(t) for t in term_ids],
                            [float(v) for v in idfs]))
            live_idx.append(qi)
        if not queries:
            return out
        scores, ids, labels = _nat.tier_batch(
            self.built, queries, top_k, deleted_arr=self.deleted_arr)
        for row, qi in enumerate(live_idx):
            if labels[row] == 0:
                continue
            term_ids, idfs, _ = preps[qi]
            lim = self._lim_ids(term_ids, idfs)
            out[qi] = (scores[row], ids[row], lim)
        return out

    def _lim_ids(self, term_ids, term_idf, mask=None) -> np.ndarray:
        """Low-id matcher ids (device.py LIM rows, host twin): the
        lowest LIM_K ids of the maximum-gram-coverage class — docs
        carrying as many distinct scoring terms as any doc does — over
        the same device lanes (champion ranges for clipped terms, whose
        lowest ids are reserved at champion build)."""
        from .device import LIM_K, LIM_WINDOW, term_device_range

        built = self.built
        lanes = []
        for t, i in zip(term_ids, term_idf):
            if float(i) <= 0.0:
                continue
            s, n = term_device_range(built, int(t))
            docs = built.postings_docs[s:s + n]
            if docs.size:
                lanes.append(docs)
        if not lanes:
            return np.zeros(0, np.int64)
        ids, cnts = np.unique(np.concatenate(lanes), return_counts=True)
        ids = ids.astype(np.int64)
        if self.deleted_arr is not None and self.deleted_arr.size:
            keep = ~self.deleted_arr[ids]
            ids, cnts = ids[keep], cnts[keep]
        if mask is not None and mask.size >= built.num_docs:
            keep = mask[ids]
            ids, cnts = ids[keep], cnts[keep]
        if ids.size == 0:
            return np.zeros(0, np.int64)
        lim = ids[cnts == cnts.max()]
        lim = lim[lim < LIM_WINDOW]
        return lim[:LIM_K]
