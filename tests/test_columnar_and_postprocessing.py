"""Columnar filter masks vs VM (property test), facets, boosts, sort e2e."""

import random

import numpy as np
import pytest

from infidex_tpu import (Boost, BoostStrength, Document, DocumentFields,
                         Field, Filter, Query, SearchEngine, Weight)
from infidex_tpu.core.documents import DocumentCollection
from infidex_tpu.filtering.columnar import ColumnStore
from infidex_tpu.filtering.compiler import FilterCompiler
from infidex_tpu.filtering.vm import FilterVM

GENRES = ["Drama", "Comedy", "Horror", "SciFi", None, ""]
TITLES = ["Alpha One", "Beta Two", "Gamma Three", "Delta Four", "the end"]

EXPRESSIONS = [
    "genre = 'Drama'",
    "genre != 'Drama'",
    "year > 2000",
    "year >= 1995",
    "year < 1990",
    "year BETWEEN 1990 AND 2005",
    "genre IN ('Drama', 'SciFi')",
    "title CONTAINS 'a'",
    "title STARTS WITH 'the'",
    "title ENDS WITH 'two'",
    "title LIKE '%a%'",
    r"title MATCHES '^[AB]'",
    "genre IS NULL",
    "genre IS NOT NULL",
    "genre = 'Drama' AND year > 1995",
    "genre = 'Drama' OR genre = 'Comedy'",
    "NOT genre = 'Drama'",
    "(genre = 'Drama' || genre = 'SciFi') && year >= 1990",
    "genre = 'Drama' ? year > 2000 : year <= 2000",
    "missing_field = 'x'",
    "missing_field IS NULL",
]


@pytest.fixture(scope="module")
def docs():
    rng = random.Random(7)
    collection = DocumentCollection()
    for i in range(200):
        f = DocumentFields()
        f.add_field("title", rng.choice(TITLES), indexable=True)
        f.add_field("genre", rng.choice(GENRES), indexable=False, filterable=True)
        f.add_field("year", rng.randint(1980, 2020), indexable=False, filterable=True)
        collection.add_document(Document(i, f))
    return collection


class TestColumnarVsVM:
    @pytest.mark.parametrize("expr", EXPRESSIONS)
    def test_mask_matches_vm(self, docs, expr):
        flt = Filter.parse(expr)
        store = ColumnStore(docs)
        mask = store.evaluate(flt)

        compiled = FilterCompiler().compile(flt)
        vm = FilterVM()
        for i in range(len(docs)):
            doc = docs.get_document(i)
            expected = vm.execute(compiled, doc.fields)
            assert mask[i] == expected, (
                f"{expr}: doc {i} fields="
                f"{[(f.name, f.value) for f in doc.fields]} "
                f"vm={expected} columnar={mask[i]}")

    def test_facet_counts_match_python(self, docs):
        store = ColumnStore(docs)
        ids = np.arange(len(docs))
        pairs = store.facet_counts("genre", ids)
        expected = {}
        for i in range(len(docs)):
            v = docs.get_document(i).fields.get_field("genre").value
            if v:
                expected[str(v)] = expected.get(str(v), 0) + 1
        assert dict(pairs) == expected


def build_engine():
    eng = SearchEngine.create_default()
    data = [
        ("The Shawshank Redemption", "Drama", 1994),
        ("The Godfather", "Crime", 1972),
        ("Alien", "Horror", 1979),
        ("Aliens", "SciFi", 1986),
        ("Alien 3", "SciFi", 1992),
        ("Drama Club", "Comedy", 2001),
    ]
    docs = []
    for i, (title, genre, year) in enumerate(data):
        f = DocumentFields()
        f.add_field("title", title, Weight.HIGH)
        f.add_field("genre", genre, indexable=False, filterable=True,
                    facetable=True)
        f.add_field("year", year, indexable=False, filterable=True,
                    sortable=True, facetable=True)
        docs.append(Document(i, f))
    eng.index_documents(docs)
    return eng


class TestEndToEndPostProcessing:
    def test_filter_applied_after_ranking(self):
        eng = build_engine()
        q = Query("alien", 10)
        q.filter = Filter.parse("genre = 'SciFi'")
        result = eng.search(q)
        titles = [eng.get_document(r.document_id).fields.get_field("title").value
                  for r in result.records]
        assert titles and all(
            eng.get_document(r.document_id).fields.get_field("genre").value == "SciFi"
            for r in result.records)

    def test_precompiled_bytecode_filter(self):
        eng = build_engine()
        q = Query("alien", 10)
        q.compiled_filter_bytecode = Filter.parse("genre = 'Horror'").compile_to_bytes()
        result = eng.search(q)
        genres = [eng.get_document(r.document_id).fields.get_field("genre").value
                  for r in result.records]
        assert genres == ["Horror"]

    def test_boost_reorders(self):
        eng = build_engine()
        q = Query("alien", 10)
        q.enable_boost = True
        q.boosts = [Boost(Filter.parse("year > 1990"), BoostStrength.HIGH)]
        result = eng.search(q)
        first = eng.get_document(result.records[0].document_id)
        assert first.fields.get_field("year").value > 1990

    def test_sort_by_field(self):
        eng = build_engine()
        q = Query("alien", 10)
        q.sort_by = Field("year")
        q.sort_ascending = True
        result = eng.search(q)
        years = [eng.get_document(r.document_id).fields.get_field("year").value
                 for r in result.records]
        assert years == sorted(years)

    def test_facets(self):
        eng = build_engine()
        q = Query("alien", 10)
        q.enable_facets = True
        result = eng.search(q)
        assert result.facets is not None and "genre" in result.facets
        genre_counts = dict(result.facets["genre"])
        assert genre_counts.get("SciFi", 0) >= 1

    def test_empty_query_with_facets(self):
        eng = build_engine()
        q = Query("", 10)
        q.enable_facets = True
        result = eng.search(q)
        assert result.facets is not None
        assert len(result.records) == 6

    def test_empty_query_facets_with_filter(self):
        eng = build_engine()
        q = Query("", 10)
        q.enable_facets = True
        q.filter = Filter.parse("genre = 'SciFi'")
        result = eng.search(q)
        assert len(result.records) == 2
