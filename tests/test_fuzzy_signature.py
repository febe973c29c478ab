"""MXU n-gram signature fuzzy expansion == host delete-variant dictionary.

The signature prefilter must have no false negatives for LD1, so after the
shared exact-verify step both backends return identical term-id arrays —
and the full engine must rank identically whichever backend is active."""

import numpy as np
import pytest

from infidex_tpu.core.documents import Document
from infidex_tpu.engine import SearchEngine
from infidex_tpu.api.query import Query
from infidex_tpu.ops.fuzzy import NGramSignatureIndex, _bigram_bits
from infidex_tpu.utils.metrics import levenshtein

TITLES = [
    "The Shawshank Redemption", "The Godfather", "The Dark Knight",
    "Pulp Fiction", "Schindler's List", "Forrest Gump", "Fight Club",
    "Inception", "The Matrix", "Goodfellas", "Interstellar", "Seven",
    "The Silence of the Lambs", "Saving Private Ryan", "The Green Mile",
    "Terminator 2: Judgment Day", "Back to the Future", "Alien", "Aliens",
    "Gladiator", "The Departed", "The Prestige", "Memento", "The Pianist",
]

TYPO_TOKENS = ["shawshenk", "redemptoin", "godfathr", "knigt", "fictoin",
               "inceptoin", "matrx", "gladiatr", "mement", "prestige",
               "terminator", "alein", "xyzzy", "aaaa"]


@pytest.fixture(scope="module")
def engine():
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(TITLES)])
    return eng


def _dict_expand(model, token):
    """Force the host delete-variant dictionary path."""
    model._fuzzy_cache.put(token, None)  # ensure no stale entry
    model._fuzzy_cache._data.pop(token, None) if hasattr(model._fuzzy_cache, "_data") else None
    # call the dict path directly by bypassing the threshold
    from infidex_tpu.index.vector_model import _delete_variants

    ld1 = model._ensure_ld1_index()
    cand = set()
    for v in [token] + _delete_variants(token):
        for tid in ld1.get(v, ()):
            cand.add(tid)
    matched = [tid for tid in cand if model._ld1_verify(token, model.built.terms[tid])]
    return np.asarray(sorted(matched)[:1024], dtype=np.int64)


def test_signature_matches_dictionary(engine):
    model = engine.vector_model
    sig = NGramSignatureIndex(model.built.terms, model.built.df)
    sig_results = sig.match_batch(TYPO_TOKENS, model._ld1_verify)
    for tok, got in zip(TYPO_TOKENS, sig_results):
        want = _dict_expand(model, tok)
        np.testing.assert_array_equal(got, want), tok


def test_signature_prefilter_no_false_negatives(engine):
    """Every exact-LD1 vocab term must survive the signature prefilter."""
    model = engine.vector_model
    sig = NGramSignatureIndex(model.built.terms, model.built.df)
    for tok in TYPO_TOKENS:
        cands = set(int(x) for x in sig.candidates_batch([tok])[0])
        for tid, term in enumerate(model.built.terms):
            if len(term) < 3 or model.built.df[tid] <= 0:
                continue
            if abs(len(term) - len(tok)) <= 1 and levenshtein(tok, term, 1) <= 1:
                assert tid in cands, (tok, term)


def test_engine_ranking_identical_across_backends():
    docs = [Document(i, t) for i, t in enumerate(TITLES)]

    eng_dict = SearchEngine.create_default()
    eng_dict.index_documents(docs)

    eng_sig = SearchEngine.create_default()
    eng_sig.index_documents([Document(i, t) for i, t in enumerate(TITLES)])
    # Force the signature backend regardless of vocabulary size
    eng_sig.vector_model.SIGNATURE_VOCAB_THRESHOLD = 0

    for qtext in ["shawshenk", "redemptoin day", "the godfathr",
                  "fight clab", "intersteller"]:
        a = eng_dict.search(Query(qtext, 10)).records
        b = eng_sig.search(Query(qtext, 10)).records
        assert [(e.document_id, e.score) for e in a] == \
               [(e.document_id, e.score) for e in b], qtext


def test_prime_fuzzy_cache_batch():
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(TITLES)])
    model = eng.vector_model
    model.SIGNATURE_VOCAB_THRESHOLD = 0
    model.prime_fuzzy_cache(["shawshenk", "godfathr", "shawshenk"])
    # primed entries must equal direct expansion
    for tok in ["shawshenk", "godfathr"]:
        cached = model._fuzzy_cache.get(tok)
        assert cached is not None
        direct = _dict_expand(model, tok)
        np.testing.assert_array_equal(cached, direct)


def test_bigram_bits_unicode_and_short():
    assert _bigram_bits("").size == 0
    assert _bigram_bits("a").size == 0
    assert _bigram_bits("zelená").size > 0
    # surrogate-safe
    assert _bigram_bits("a\ud800b").size > 0
