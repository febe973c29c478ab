"""Positional prefix index + champion lists for O(1) short-query autocomplete.

Behavioral reference: Infidex ``Indexing/ShortQuery/PositionalPrefixIndex.cs``
(1-3 char token-start prefixes -> positional postings (doc_id, token_pos,
is_word_start=True)) and ``ShortQueryResolver.cs`` (precomputed top-64
champion lists per prefix; packed ushort score: precedence byte << 8 | base
byte — word-start=128, first-word-start=64, exact-token=32, first-token-
exact=16, title==q=8, <=3-token title adds 32; base = position decay +
word-start density, or occurrence density).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..core.documents import DocumentCollection
from .vector_model import ScoreEntry

CHAMPION_LIST_SIZE = 64
MAX_PREFIX_LENGTH = 3


class PositionalPrefixIndex:
    def __init__(self, min_prefix_length: int = 1, max_prefix_length: int = 3,
                 delimiters=(" ",)):
        self.min_prefix_length = max(1, min_prefix_length)
        self.max_prefix_length = min(MAX_PREFIX_LENGTH, max_prefix_length)
        self._delims = set(delimiters)
        # prefix -> list of (doc_id, token_pos)
        self._index: Dict[str, List[Tuple[int, int]]] = {}
        self._frozen = False

    def index_document(self, text: str, document_id: int) -> None:
        if not text:
            return
        i, n = 0, len(text)
        token_index = 0
        while i < n:
            while i < n and text[i] in self._delims:
                i += 1
            start = i
            while i < n and text[i] not in self._delims:
                i += 1
            length = i - start
            if length > 0:
                max_len = min(length, self.max_prefix_length)
                for plen in range(self.min_prefix_length, max_len + 1):
                    prefix = text[start : start + plen]
                    lst = self._index.get(prefix)
                    if lst is None:
                        self._index[prefix] = [(document_id, token_index)]
                    else:
                        if not isinstance(lst, list):
                            # bulk-loaded ndarray: make mutable on demand
                            lst = [tuple(r) for r in lst.tolist()]
                            self._index[prefix] = lst
                        lst.append((document_id, token_index))
                token_index += 1
        self._frozen = False

    def load_bulk(self, index) -> None:
        """Install the native bulk builder's prefix map (values are
        (doc, token_pos) int32 arrays already in sorted order)."""
        self._index = index
        self._frozen = True

    def freeze(self) -> None:
        for postings in self._index.values():
            if isinstance(postings, list):
                postings.sort()
        self._frozen = True

    def get_posting_list(self, prefix: str) -> Optional[List[Tuple[int, int]]]:
        if not prefix or len(prefix) > self.max_prefix_length:
            return None
        return self._index.get(prefix)

    def has_prefix(self, prefix: str) -> bool:
        lst = self.get_posting_list(prefix)
        return lst is not None and len(lst) > 0

    def count_documents(self, prefix: str) -> int:
        lst = self.get_posting_list(prefix)
        if lst is None or len(lst) == 0:
            return 0
        return len({int(r[0]) for r in lst})

    def get_document_ids(self, prefix: str) -> set:
        lst = self.get_posting_list(prefix)
        if lst is None or len(lst) == 0:
            return set()
        return {int(r[0]) for r in lst}

    def all_prefixes(self):
        return self._index.items()

    def state_dict(self) -> dict:
        return {"index": self._index,
                "min": self.min_prefix_length, "max": self.max_prefix_length}

    def load_state_dict(self, state: dict) -> None:
        self._index = state["index"]
        self.min_prefix_length = state["min"]
        self.max_prefix_length = state["max"]
        self.freeze()

    def clear(self) -> None:
        self._index.clear()


class _DocScore:
    __slots__ = ("document_key", "occurrences", "word_start_count",
                 "has_word_start", "first_word_start_position")

    def __init__(self, document_key: int):
        self.document_key = document_key
        self.occurrences = 0
        self.word_start_count = 0
        self.has_word_start = False
        self.first_word_start_position = 2**31


class ShortQueryResolver:
    def __init__(self, prefix_index: PositionalPrefixIndex,
                 documents: DocumentCollection, delimiters=(" ",)):
        self._prefix_index = prefix_index
        self._documents = documents
        self._delims = set(delimiters)
        # Champion lists build lazily per prefix on first use: the
        # reference builds them eagerly in parallel at finalize
        # (ShortQueryResolver.cs:113-120); computing only touched prefixes
        # gives the same answers and keeps indexing latency flat.
        self._champion_lists: Dict[str, List[ScoreEntry]] = {}
        self._champion_built: set = set()

    def _split(self, text: str) -> List[str]:
        out, cur = [], []
        for ch in text:
            if ch in self._delims:
                if cur:
                    out.append("".join(cur))
                    cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    def _score_postings(self, postings) -> Dict[int, _DocScore]:
        doc_scores: Dict[int, _DocScore] = {}
        for doc_id, pos in postings:
            score = doc_scores.get(doc_id)
            if score is None:
                doc = self._documents.get_document(doc_id)
                if doc is None or doc.deleted:
                    continue
                score = _DocScore(doc.document_key)
                doc_scores[doc_id] = score
            score.occurrences += 1
            score.word_start_count += 1  # all postings are word starts
            if not score.has_word_start or pos < score.first_word_start_position:
                score.has_word_start = True
                score.first_word_start_position = pos
        return doc_scores

    def _calculate_final_score(self, query: str, doc, score: _DocScore) -> int:
        precedence = 0
        if score.has_word_start:
            precedence |= 128
            if score.first_word_start_position == 0:
                precedence |= 64
        title_lower = (doc.indexed_text or "").lower()
        tokens = self._split(title_lower)
        any_exact = False
        first_exact = False
        for i, t in enumerate(tokens):
            if t == query:
                any_exact = True
                if i == 0:
                    first_exact = True
                break
        if any_exact:
            precedence |= 32
        if first_exact:
            precedence |= 16
        if title_lower.strip() == query:
            precedence |= 8
        if len(tokens) <= 3:
            precedence |= 32

        if score.has_word_start:
            pos_component = 255 - min(score.first_word_start_position * 16, 240)
            density = min(score.word_start_count * 8, 32)
            base = max(0, min(pos_component + density, 255))
        else:
            base = max(1, min(score.occurrences * 4, 200))
        return (precedence << 8) | base

    def _resolve_postings(self, query: str, postings) -> List[ScoreEntry]:
        doc_scores = self._score_postings(postings)
        entries: List[ScoreEntry] = []
        for doc_id, score in doc_scores.items():
            doc = self._documents.get_document(doc_id)
            if doc is None or doc.deleted:
                continue
            final = self._calculate_final_score(query, doc, score)
            entries.append(ScoreEntry(float(final), score.document_key))
        entries.sort(key=lambda e: -e.score)
        return entries

    def _champions_for(self, prefix: str) -> Optional[List[ScoreEntry]]:
        """Champion list for one prefix, built and cached on first access."""
        if prefix in self._champion_built:
            return self._champion_lists.get(prefix)
        self._champion_built.add(prefix)
        postings = self._prefix_index.get_posting_list(prefix)
        if postings is None or len(postings) == 0:
            return None
        entries = self._resolve_postings(prefix, postings)
        if entries:
            self._champion_lists[prefix] = entries[:CHAMPION_LIST_SIZE]
            return self._champion_lists[prefix]
        return None

    def resolve(self, query: str, max_results: int = 2**31) -> List[ScoreEntry]:
        if not query or len(query) > self._prefix_index.max_prefix_length:
            return []
        ok, champions = self.try_get_champions(query, max_results)
        if ok:
            return champions
        postings = self._prefix_index.get_posting_list(query)
        if postings is None or len(postings) == 0:
            return []
        entries = self._resolve_postings(query, postings)
        return entries[:max_results]

    def try_get_champions(self, prefix: str, max_results: int) -> Tuple[bool, List[ScoreEntry]]:
        if max_results <= 0 or not prefix or \
                len(prefix) > self._prefix_index.max_prefix_length:
            return False, []
        champions = self._champions_for(prefix)
        if not champions or len(champions) < max_results:
            return False, []
        return True, champions[:max_results]
