"""Czech school-name golden ranking tests (diacritics + joined words).

Behavioral reference: Infidex ``SchoolSearchParityTests.cs`` — the
multilingual parity crown jewel: 7629 real Czech school names
(schools.json), diacritic-folded queries, joined-word splits
("sciozlín" -> "ScioŠkola Zlín"), and informative-term preference
("bělohrad" outweighs generic "mateřská škola" words).

The corpus ships with the reference test suite; only the data is used.
"""

import json
import os

import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.core.config import get_config
from infidex_tpu.synonyms import SynonymMap

SCHOOLS_JSON = "/root/reference/src/Infidex.Tests/schools.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SCHOOLS_JSON), reason="schools.json corpus not present")

# Default = the full 7,629-name corpus, matching the reference suite's
# scale (IDF and rankings shift with corpus size, so the slice must be
# the whole thing for the assertions to mean what the reference's do).
# Set INFIDEX_TPU_SCHOOL_LIMIT to shrink during quick local iteration.
CORPUS_LIMIT = int(os.environ.get("INFIDEX_TPU_SCHOOL_LIMIT", "7629"))


@pytest.fixture(scope="module")
def engine():
    names = [d["name"] for d in json.load(open(SCHOOLS_JSON))]
    # keep assertion targets in the corpus regardless of the limit
    keep = [n for n in names
            if "Bělohradská" in n or "ScioŠkola" in n or "Kolín" in n]
    subset = names[:CORPUS_LIMIT]
    for n in keep:
        if n not in subset:
            subset.append(n)

    synonyms = SynonymMap()
    synonyms.add_synonym("zs", "zakladni")
    synonyms.add_synonym("ss", "stredni")
    synonyms.add_synonym("gympl", "gymnazium")

    config = get_config(400)
    eng = SearchEngine(
        index_sizes=config.index_sizes,
        start_pad_size=config.start_pad_size,
        stop_pad_size=config.stop_pad_size,
        enable_coverage=True,
        text_normalizer=config.text_normalizer,
        tokenizer_setup=config.tokenizer_setup,
        stop_term_limit=config.stop_term_limit,
        word_matcher_setup=config.word_matcher_setup,
        field_weights=config.field_weights,
        synonym_map=synonyms,
    )
    eng.index_documents([Document(i, n) for i, n in enumerate(subset)])
    return eng


def _top_texts(engine, query, k=20):
    result = engine.search(Query(query, k))
    return [engine.get_document(r.document_id).indexed_text
            for r in result.records]


class TestBelohrad:
    TARGET = "Bělohradská mateřská škola"

    def test_permutations_prefer_belohradska(self, engine):
        """Informative term dominates generic words, any position
        (SchoolSearchParityTests.cs:94-155)."""
        queries = [
            "mateřská škola lázně bělohrad",
            "mateřská bělohrad škola lázně",
            "bělohrad mateřská škola lázně",
            "bělohrad lázně mateřská škola",
        ]
        for q in queries:
            tops = _top_texts(engine, q)
            assert tops, q
            assert tops[0] == self.TARGET, (q, tops[:5])

    def test_bel_prefixes_first_for_all(self, engine):
        """Autocomplete prefixes 'bel'..'belohradska' (:160-190)."""
        for q in ["bel", "belo", "beloh", "belohr", "belohra",
                  "belohrad", "belohrads", "belohradska"]:
            tops = _top_texts(engine, q)
            assert tops, q
            assert tops[0] == self.TARGET, (q, tops[:5])


class TestScioZlin:
    def _scores(self, engine, query):
        result = engine.search(Query(query, 20))
        zlin = kolin = 0.0
        for r in result.records:
            text = engine.get_document(r.document_id).indexed_text
            if "ScioŠkola Zlín" in text:
                zlin = max(zlin, r.score)
            if "ScioŠkola Kolín" in text:
                kolin = max(kolin, r.score)
        return zlin, kolin

    @pytest.mark.parametrize("query", [
        "sciozlí", "sciozlín", "sciozlínskáškola", "scio škola ve zlíně"])
    def test_zlin_first_and_beats_kolin(self, engine, query):
        """Joined-word + suffix evidence: 'zlí(n)' strongly matches Zlín,
        weakly Kolín (:195-370)."""
        tops = _top_texts(engine, query)
        assert tops, query
        assert "ScioŠkola Zlín".lower() in tops[0].lower(), (query, tops[:5])
        zlin, kolin = self._scores(engine, query)
        assert zlin > 0
        if kolin > 0:
            assert zlin > kolin, (query, zlin, kolin)


class TestDiacriticsFolding:
    def test_folded_query_matches_accented_name(self, engine):
        """ASCII-folded input must reach the accented document."""
        tops = _top_texts(engine, "belohradska materska skola")
        assert tops and tops[0] == "Bělohradská mateřská škola", tops[:5]
