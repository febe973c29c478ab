"""Eager (vectorized) champion builds vs the lazy scalar oracle.

ShortQueryResolver.cs:113-204 builds top-64 champion lists for every
prefix in parallel at freeze; build_all_champions is the TPU repo's
vectorized equivalent and must produce byte-identical lists to the lazy
per-prefix scalar path."""

import random

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.core.documents import DocumentCollection
from infidex_tpu.index.short_query import (PositionalPrefixIndex,
                                           ShortQueryResolver)

WORDS = ["sun", "sea", "star", "stone", "sky", "ab", "a", "be", "bee",
         "storm", "app", "apple", "x", "go", "gone", "so", "son", "song"]


def _mk(n_docs=400, seed=7):
    rng = random.Random(seed)
    docs = DocumentCollection()
    idx = PositionalPrefixIndex()
    for i in range(n_docs):
        text = " ".join(rng.choice(WORDS)
                        for _ in range(rng.randint(1, 6)))
        d = Document(i, text)
        stored = docs.add_document(d)
        idx.index_document(text.lower(), stored.id)
    # some deletions exercise the live filter
    for k in rng.sample(range(n_docs), n_docs // 10):
        docs.delete_documents_by_key(k)
    idx.freeze()
    return docs, idx


def test_eager_matches_lazy_champions():
    docs, idx = _mk()
    lazy = ShortQueryResolver(idx, docs)
    eager = ShortQueryResolver(idx, docs)
    n_built = eager.build_all_champions()
    assert n_built > 0
    prefixes = [p for p, lst in idx.all_prefixes() if len(lst)]
    assert set(eager._champion_built) == set(
        p for p in prefixes if lazy._champions_for(p))
    for p in prefixes:
        want = lazy._champions_for(p)
        got = eager._champion_lists.get(p)
        if want is None:
            assert got is None or p not in eager._champion_built
            continue
        assert got is not None, p
        assert [(e.score, e.document_id) for e in got] == \
            [(e.score, e.document_id) for e in want], p


def test_eager_build_idempotent_and_lazy_after():
    docs, idx = _mk(n_docs=120, seed=3)
    r = ShortQueryResolver(idx, docs)
    n1 = r.build_all_champions()
    n2 = r.build_all_champions()
    assert n2 == 0  # already built; publish is per-prefix
    ok, lst = r.try_get_champions("s", 5)
    if ok:
        assert len(lst) == 5


def test_engine_finalize_builds_champions(tmp_path):
    eng = SearchEngine.create_default()
    eng.index_documents(
        [Document(i, f"sample doc {i} stone") for i in range(300)])
    resolver = eng.vector_model.short_query_resolver
    assert resolver is not None
    # finalize built every indexed prefix eagerly - first short query
    # hits the precomputed list, no lazy scan
    assert "s" in resolver._champion_built
    assert "sa" in resolver._champion_built
    res = eng.search(Query("s", 5))
    assert res.records
