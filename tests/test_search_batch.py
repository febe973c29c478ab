"""search_batch == per-query search (records, scores, facets).

The batched path shares device calls across queries (batched Stage-1
scatter + qsel-routed coverage chunks) but must be semantically identical
to B independent ``search`` calls.
"""

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.scoring import pipeline as pl

TITLES = [
    "The Shawshank Redemption", "The Godfather", "The Dark Knight",
    "Star Wars: A New Hope", "Star Trek Into Darkness", "Batman Begins",
    "Inception", "Interstellar", "The Matrix", "Blade Runner",
    "Blade Runner 2049", "Alien", "Aliens", "The Terminator",
    "Terminator 2: Judgment Day", "Jurassic Park", "Back to the Future",
    "The Empire Strikes Back", "Return of the Jedi", "Gladiator",
    "New York Stories", "Gangs of New York", "Escape from New York",
]

QUERIES = [
    "shawshank", "teh godfather", "star", "star wars", "blade runnr",
    "termnator", "new york", "redemption sh", "batman begin", "a",
    "jurasic park", "the", "interstellar", "alien", "",
]


@pytest.fixture(scope="module")
def engine():
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(TITLES)])
    return eng


def _records(result):
    return [(r.document_id, round(r.score, 4), r.tiebreaker)
            for r in result.records]


def test_batch_matches_sequential(engine):
    singles = [engine.search(Query(q, 10)) for q in QUERIES]
    batch = engine.search_batch([Query(q, 10) for q in QUERIES])
    assert len(batch) == len(singles)
    for q, s, b in zip(QUERIES, singles, batch):
        assert _records(s) == _records(b), q


def test_batch_matches_sequential_device_path(engine, monkeypatch):
    # Force every eligible worklist through the device kernel.
    monkeypatch.setattr(pl, "DEVICE_COVERAGE_MIN_CANDIDATES", 1)
    queries = ["shawshank", "star wars", "blade runnr", "new york",
               "teh godfather", "terminator 2"]
    singles = [engine.search(Query(q, 10)) for q in queries]
    batch = engine.search_batch([Query(q, 10) for q in queries])
    for q, s, b in zip(queries, singles, batch):
        assert _records(s) == _records(b), q


def test_batch_mixed_params(engine):
    qs = [Query("star", 3), Query("blade", 10), Query("alien", 1)]
    singles = [engine.search(q) for q in qs]
    batch = engine.search_batch(qs)
    for s, b in zip(singles, batch):
        assert _records(s) == _records(b)


def test_batch_with_facets_and_filter(engine):
    q1 = Query("star wars", 10)
    q1.enable_facets = True
    q2 = Query("new york", 10)
    singles = [engine.search(q1), engine.search(q2)]
    batch = engine.search_batch([q1, q2])
    for s, b in zip(singles, batch):
        assert _records(s) == _records(b)
        assert (s.facets is None) == (b.facets is None)


def test_batch_empty_and_single(engine):
    assert engine.search_batch([]) == []
    b = engine.search_batch([Query("inception", 5)])
    s = engine.search(Query("inception", 5))
    assert _records(s) == _records(b[0])


def test_stage1_device_batch_matches_single(engine):
    """DeviceIndex.search_batch == per-query DeviceIndex.search.

    The single kernel takes host-materialized fuzzy doc unions; the batch
    kernel unions matched term ids on device — this asserts the two fuzzy
    paths produce identical scores (typo queries included below)."""
    from infidex_tpu.index.device import compute_idf

    model = engine.vector_model
    device = model.device
    preps = []
    for q in ["shawshank", "star wars", "godfather", "terminator",
              "shawshenk", "termnator wars"]:
        p = model.prepare_stage1(q)
        assert p is not None
        preps.append(p)

    def materialize(groups):
        ed_l, ei_l = [], []
        for grp in groups:
            chunks = [model.built.postings_for(int(t))[0]
                      for t in np.asarray(grp)]
            union = np.unique(np.concatenate(chunks)) if chunks else \
                np.zeros(0, np.int32)
            if 0 < union.size <= model.stop_term_limit:
                fidf = compute_idf(model.documents.count, int(union.size))
                ed_l.append(union.astype(np.int32))
                ei_l.append(np.full(union.size, fidf, np.float32))
        if not ed_l:
            return None, None
        return np.concatenate(ed_l), np.concatenate(ei_l)

    singles = []
    for (t, i, groups) in preps:
        ed, ei = materialize(groups)
        singles.append(device.search(t, i, 16, ed, ei))
    batch = device.search_batch(preps, 16, total_docs=model.documents.count,
                                stop_term_limit=model.stop_term_limit)
    for (s_sc, s_id), (b_sc, b_id, _lim) in zip(singles, batch):
        np.testing.assert_allclose(s_sc, b_sc, rtol=1e-6)
        # ids may tie-break differently only where scores tie; require
        # exact equality where scores are distinct
        np.testing.assert_array_equal(s_id, b_id)


def test_split_batch_by_lanes(engine):
    """Lane-capped batch splitting: groups respect the cap, order is
    contiguous, and split results equal unsplit results."""
    from infidex_tpu.index.device import split_batch_by_lanes

    model = engine.vector_model
    preps = []
    for q in ["shawshank", "new york", "star wars", "the godfather"]:
        p = model.prepare_stage1(q)
        assert p is not None
        preps.append(p)

    assert split_batch_by_lanes(model.built, preps) == [(0, len(preps))]
    groups = split_batch_by_lanes(model.built, preps, cap=1)
    assert [g for g in groups] == [(i, i + 1) for i in range(len(preps))]

    base = model.device.search_batch(preps, 10,
                                     total_docs=model.documents.count)
    import infidex_tpu.index.device as dev_mod
    old = dev_mod._MAX_L_PER_CALL
    dev_mod._MAX_L_PER_CALL = 1
    try:
        split = model.device.search_batch(preps, 10,
                                          total_docs=model.documents.count)
    finally:
        dev_mod._MAX_L_PER_CALL = old
    for (s1, i1, _l1), (s2, i2, _l2) in zip(base, split):
        import numpy as np

        np.testing.assert_allclose(s1, s2, rtol=1e-6)
        np.testing.assert_array_equal(i1, i2)


def test_champion_clipping_bounds_device_lanes():
    """High-df terms ship only their top-CAP-by-weight postings to the
    device (impact-ordered truncation); the best-tf docs must survive and
    the full CSR stays intact for the exact host paths."""
    import numpy as np

    from infidex_tpu.core.documents import Document
    from infidex_tpu.index.device import term_device_range
    from infidex_tpu.index.vector_model import VectorModel
    from infidex_tpu.tokenization.normalizer import TextNormalizer
    from infidex_tpu.tokenization.tokenizer import Tokenizer, TokenizerSetup

    from infidex_tpu.api.fields import DocumentFields, Field, Weight

    tok = Tokenizer([3], 2, 0, TextNormalizer.create_default(),
                    TokenizerSetup())
    m = VectorModel(tok)
    # every doc contains "common"; doc 7 carries it in a HIGH-weight field
    for i in range(300):
        f = DocumentFields()
        f.add_field(Field("t", f"common word{i}",
                          Weight.HIGH if i == 7 else Weight.LOW))
        m.index_document(Document(i, f))
    m.build_inverted_lists()
    built = m.built
    tid = built.get_id("common")
    assert tid >= 0 and built.df[tid] >= 300

    # DeviceIndex already ran ensure_champions() at the default cap
    # (no-op here); rebuild the lazy extension at a small test cap.
    built.champion_starts = None
    built.ensure_champions(cap=64)
    s, n = term_device_range(built, tid)
    assert n == 64
    champ_docs = built.ext_docs[s : s + n]
    champ_w = built.ext_weights[s : s + n]
    assert np.all(np.diff(champ_docs) > 0)          # doc-id sorted
    assert 7 in champ_docs                           # best-tf doc survives
    assert champ_w.min() >= np.sort(
        built.postings_weights[built.term_offsets[tid]:
                               built.term_offsets[tid + 1]])[-64]
    # full CSR untouched for exact host paths
    full_docs, _ = built.postings_for(tid)
    assert full_docs.size == built.df[tid]


def test_replay_last_s1(engine):
    """replay_last_s1 re-executes the last Stage-1 program and returns
    (walls, compulsory_bytes) — the bandwidth-evidence hook bench.py's
    hbm_gbps field is built on. Must not perturb serving results."""
    import numpy as np

    model = engine.vector_model
    device = model.device
    preps = [model.prepare_stage1(q) for q in ["shawshank", "star wars"]]
    base = device.search_batch(preps, 8, total_docs=model.documents.count)
    r = device.replay_last_s1(reps=2)
    assert r is not None
    walls, nbytes = r
    assert len(walls) == 2 and all(w > 0 for w in walls)
    assert nbytes > 0
    again = device.search_batch(preps, 8, total_docs=model.documents.count)
    for (s1, i1, _), (s2, i2, _) in zip(base, again):
        np.testing.assert_array_equal(s1, s2)
        np.testing.assert_array_equal(i1, i2)
