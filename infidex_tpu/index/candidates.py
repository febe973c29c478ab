"""Tiered candidate selection over the CSR postings (host-side).

Behavioral reference: Infidex ``Scoring/TieredCandidateSelector.cs``
(533 LoC): (0) positional-prefix precedence for strong prefixes;
(1) disjunctive union when a typo is suspected (df < 10), terms are
missing, or the query is single-term; else tiered AND — all-terms
intersection (leapfrog), then n-1 terms, then <= 2 selective high-IDF terms
(idf >= 0.3 * max), with cardinality early-exits at top_k * {2, 3, 5, 10}.

TPU note: the DEVICE Stage-1 deliberately skips candidate pruning — the
full disjunction is one dense scatter + top-k and is faster than pointer
chasing (index/device.py). This host implementation exists for (a) parity
with the reference's semantics, (b) very large corpora where a host-side
pre-selection shrinks the device worklist, and (c) environments without a
device. Intersections ride numpy set ops (the reference rides roaring).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

TYPO_SUSPECT_DF = 10
IDF_SELECTIVE_FRACTION = 0.3
TIER_EXITS = (2, 3, 5, 10)


class TieredCandidateSelector:
    """Candidate-doc generation with tiered intersection early-exits."""

    def __init__(self, built):
        self.built = built

    def _postings(self, term_id: int) -> np.ndarray:
        s = self.built.term_offsets[term_id]
        e = self.built.term_offsets[term_id + 1]
        return self.built.postings_docs[s:e]

    def select(self, term_ids: List[int], term_idf: List[float],
               top_k: int) -> Tuple[np.ndarray, str]:
        """Returns (candidate doc ids ascending, tier label).

        Tier labels: "union" | "all" | "all-minus-one" | "selective".
        """
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
            parts = [self._postings(t) for t, _ in live]
            return np.unique(np.concatenate(parts)), "union"

        # Tier 1: all-terms intersection, rarest first (leapfrog analogue)
        order = np.argsort(dfs)
        inter = self._postings(live[order[0]][0])
        for oi in order[1:]:
            inter = np.intersect1d(inter, self._postings(live[oi][0]),
                                   assume_unique=True)
            if inter.size == 0:
                break
        if inter.size >= top_k * TIER_EXITS[0]:
            return inter, "all"
        result = [inter]

        # Tier 2: n-1 terms (drop the rarest — the likeliest typo)
        if len(live) >= 3:
            inter2 = self._postings(live[order[1]][0])
            for oi in order[2:]:
                inter2 = np.intersect1d(
                    inter2, self._postings(live[oi][0]), assume_unique=True)
                if inter2.size == 0:
                    break
            result.append(inter2)
            merged = np.unique(np.concatenate(result))
            if merged.size >= top_k * TIER_EXITS[1]:
                return merged, "all-minus-one"

        # Tier 3: <= 2 selective high-IDF terms
        max_idf = max(i for _, i in live)
        selective = [t for t, i in live
                     if i >= IDF_SELECTIVE_FRACTION * max_idf]
        selective.sort(key=lambda t: int(built.df[t]))
        for t in selective[:2]:
            result.append(self._postings(t))
            merged = np.unique(np.concatenate(result))
            if merged.size >= top_k * TIER_EXITS[3]:
                return merged, "selective"
        return np.unique(np.concatenate(result)), "selective"
