"""End-to-end engine smoke tests (reference: SearchEngineTests.cs,
ReferenceMatchingTests.cs — fixed tiny corpora with expected top results)."""

import pytest

from infidex_tpu import Document, Query, SearchEngine


MOVIES = [
    "The Shawshank Redemption",
    "The Godfather",
    "The Dark Knight",
    "Redemption Day",
    "Redemption Road",
    "Star Wars",
    "Star Trek",
    "Batman Begins",
    "Batman Returns",
    "The Batman",
    "Inception",
    "Interstellar",
    "New York Stories",
    "Escape from New York",
    "Speed",
    "Speed 2: Cruise Control",
]


@pytest.fixture(scope="module")
def engine():
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, title) for i, title in enumerate(MOVIES)])
    return eng


def top_titles(engine, text, k=10):
    result = engine.search(Query(text, k))
    out = []
    for r in result.records:
        doc = engine.get_document(r.document_id)
        out.append(doc.indexed_text)
    return out


class TestExactSearch:
    def test_exact_title_word(self, engine):
        titles = top_titles(engine, "shawshank")
        assert titles[0] == "The Shawshank Redemption"

    def test_multi_word(self, engine):
        titles = top_titles(engine, "dark knight")
        assert titles[0] == "The Dark Knight"

    def test_exact_wins_over_partial(self, engine):
        titles = top_titles(engine, "batman begins")
        assert titles[0] == "Batman Begins"


class TestFuzzySearch:
    def test_single_typo(self, engine):
        titles = top_titles(engine, "shawshenk")
        assert titles[0] == "The Shawshank Redemption"

    def test_heavy_typo(self, engine):
        titles = top_titles(engine, "shaawshank")
        assert titles[0] == "The Shawshank Redemption"

    def test_redemption_sh_prefix(self, engine):
        # The crown-jewel parity assertion (MovieSearchParityTests.cs:36-60)
        titles = top_titles(engine, "redemption sh")
        assert titles[0] == "The Shawshank Redemption"

    def test_split_word(self, engine):
        titles = top_titles(engine, "inter stellar")
        assert "Interstellar" in titles[:3]


class TestPrefixSearch:
    def test_prefix(self, engine):
        titles = top_titles(engine, "incep")
        assert titles[0] == "Inception"

    def test_short_query(self, engine):
        titles = top_titles(engine, "sta", 10)
        assert any(t.startswith("Star") for t in titles[:3])

    def test_single_char(self, engine):
        result = engine.search(Query("s", 5))
        assert len(result.records) > 0


class TestScoresAndMetadata:
    def test_scores_descending(self, engine):
        result = engine.search(Query("batman", 10))
        scores = [r.score for r in result.records]
        assert scores == sorted(scores, reverse=True)

    def test_max_records_respected(self, engine):
        result = engine.search(Query("the", 3))
        assert len(result.records) <= 3

    def test_empty_query(self, engine):
        result = engine.search(Query("", 10))
        assert result.records == []

    def test_statistics(self, engine):
        stats = engine.get_statistics()
        assert stats.document_count == len(MOVIES)
        assert stats.vocabulary_size > 0

    def test_unindexed_engine_returns_empty(self):
        eng = SearchEngine.create_minimal()
        assert eng.search(Query("anything", 5)).records == []


class TestDiacritics:
    def test_czech_search(self):
        eng = SearchEngine.create_default()
        eng.index_documents([
            Document(0, "Základní škola Praha"),
            Document(1, "Gymnázium Brno"),
        ])
        titles = top_titles_for(eng, "zakladni skola")
        assert titles[0] == "Základní škola Praha"

    def test_query_with_diacritics(self):
        eng = SearchEngine.create_default()
        eng.index_documents([
            Document(0, "Zakladni skola Praha"),
            Document(1, "Gymnazium Brno"),
        ])
        titles = top_titles_for(eng, "základní škola")
        assert titles[0] == "Zakladni skola Praha"


def top_titles_for(engine, text, k=10):
    result = engine.search(Query(text, k))
    return [engine.get_document(r.document_id).indexed_text for r in result.records]
