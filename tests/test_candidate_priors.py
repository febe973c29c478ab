"""Candidate-selection priors: fusion-class prior + low-id matchers.

The depth-500 budget must surface the docs a DEEP coverage pass would
rank on top. Fusion resolves quality-tie classes by ascending key
(ScoreEntry ordering), so the winning docs are (a) position-gated class
members (first-token index) and (b) the lowest-key docs with any match
(LIM rows). Oracle (deep) candidate sets must NEST production ones so
measured recall improves monotonically with depth."""

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.index.first_token import FirstTokenIndex


class TestFirstTokenIndex:
    def test_build_and_classes(self):
        texts = np.array(["dark knight", "the dark", "darkness falls",
                          "dark", "drak storm", ""], dtype=object)
        fti = FirstTokenIndex.build(texts, (" ",))
        assert fti.docs_exact("dark").tolist() == [0, 3]
        assert fti.docs_prefix("dark").tolist() == [2]   # darkness
        # symmetric-delete: 'drak' first-token collides with 'dark'
        assert 4 in fti.docs_fuzzy("dark").tolist()
        prior = fti.class_prior("dark", 10)
        assert prior.tolist()[:3] == [0, 3, 2]  # exact first, then prefix

    def test_class_prior_budget_and_dedupe(self):
        texts = np.array([f"word{i} x" for i in range(20)], dtype=object)
        fti = FirstTokenIndex.build(texts, (" ",))
        prior = fti.class_prior("word1", 5)
        assert prior.size <= 5
        assert len(set(prior.tolist())) == prior.size


@pytest.fixture(scope="module")
def big_engine():
    # 1500 docs sharing a common word; the docs whose title STARTS with
    # it sit at HIGH ids so plain BM25+id tie order would cut them out
    docs = [Document(i, f"filler number {i} common") for i in range(1400)]
    docs += [Document(1400 + i, f"common tail {i}") for i in range(100)]
    eng = SearchEngine.create_default()
    eng.index_documents(docs)
    return eng


def test_first_token_class_reachable_at_depth(big_engine):
    # production depth 500; the 'common'-at-start docs live at keys
    # 1400+, beyond the first 500 tie-ordered ids — the class prior must
    # surface them because fusion ranks title-start docs on top
    res = big_engine.search(Query("common", 10))
    got = {r.document_id for r in res.records}
    assert any(k >= 1400 for k in got), got


def test_deep_oracle_nests_production(big_engine):
    prod = big_engine.search(Query("common", 10))
    oq = Query("common", 10)
    oq.coverage_depth = 2000
    orac = big_engine.search(oq)
    want = [r.document_id for r in orac.records]
    got = {r.document_id for r in prod.records}
    hits = sum(1 for d in want if d in got)
    assert hits >= 9, (want, sorted(got))


def test_class_prior_clip_matches_unclipped():
    """The need-clipped, memoized class_prior must equal the reference
    (unclipped) class assembly for every budget — including vocabularies
    where the fuzzy class overlaps the prefix class (deletion collisions
    that are also prefix extensions)."""
    import numpy as np

    from infidex_tpu.index.first_token import FirstTokenIndex

    rng = np.random.default_rng(3)
    words = ["hans", "hansa", "hansel", "hana", "hanse", "bans", "hons",
             "han", "hant", "xenon"]
    table = {}
    for w in words:
        n = int(rng.integers(1, 60))
        ids = np.unique(rng.integers(0, 5000, size=n)).astype(np.int64)
        table[w] = ids
    fti = FirstTokenIndex(table)

    def unclipped(word, budget):
        out, seen, total = [], None, 0
        for cls in (fti.docs_exact(word), fti.docs_prefix(word),
                    fti.docs_fuzzy(word)):
            if total >= budget or cls.size == 0:
                continue
            if seen is not None and seen.size:
                cls = cls[~np.isin(cls, seen)]
            if cls.size == 0:
                continue
            cls = cls[: budget - total]
            out.append(cls)
            total += int(cls.size)
            seen = cls if seen is None else np.concatenate([seen, cls])
        return (np.concatenate(out) if out
                else np.zeros(0, np.int64))

    for word in ["hans", "han", "hansa", "nope", "xenon"]:
        for budget in (1, 3, 7, 20, 100, 10_000):
            got = fti.class_prior(word, budget)
            want = unclipped(word, budget)
            assert np.array_equal(got, want), (word, budget)
            # memo hit returns the identical result
            again = fti.class_prior(word, budget)
            assert np.array_equal(again, want)
