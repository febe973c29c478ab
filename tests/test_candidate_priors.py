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
