"""Device pool scoring (device.py _pool_score_kernel) parity vs the
host/native scorer (candidates.score_pool).

The tier path selects a candidate pool per heavy multi-term query; its
exact BM25+ can run host-side (score_pool) or on device
(DeviceIndex.pool_score_dispatch). Both must produce bit-identical
scores and the same (score desc, doc asc) top-k — a query's results
cannot depend on which side scored it.
"""

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.index import candidates as cand_mod
from infidex_tpu.index.candidates import TieredStage1, score_pool
from infidex_tpu.index.vector_model import VectorModel


WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def _build_engine(n_docs=600, seed=7):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        k = rng.integers(2, 6)
        docs.append(Document(i, " ".join(rng.choice(WORDS, size=k))))
    eng = SearchEngine.create_default()
    eng.index_documents(docs)
    return eng


@pytest.fixture(scope="module")
def engine():
    return _build_engine()


def _device_index(model: VectorModel):
    if model.device is None:
        model.build_inverted_lists()
    assert model.device is not None
    return model.device


def test_pool_kernel_matches_host_scorer(engine):
    model = engine._vector_model
    built = model.built
    dev = _device_index(model)
    rng = np.random.default_rng(3)

    jobs = []
    for q in ("alpha bravo", "charlie delta echo", "kilo lima"):
        prep = model.prepare_stage1(q)
        assert prep is not None
        term_ids = [int(t) for t in np.asarray(prep[0]).tolist()]
        idfs = [float(v) for v in np.asarray(prep[1]).tolist()]
        n_pool = int(rng.integers(50, 400))
        pool = np.unique(rng.integers(0, built.num_docs, size=n_pool))
        pool = pool.astype(np.int64)
        jobs.append((pool, term_ids, idfs))

    k = 37
    handle = dev.pool_score_dispatch(jobs, k)
    outs = dev.pool_score_collect(handle)
    assert len(outs) == len(jobs)

    for (pool, term_ids, idfs), (d_scores, d_ids) in zip(jobs, outs):
        h_scores = score_pool(built, term_ids, idfs, pool)
        order = np.argsort(-h_scores, kind="stable")[:k]
        n = order.size
        # exact f32 score equality (same op order host/device)
        np.testing.assert_array_equal(d_scores[:n], h_scores[order])
        np.testing.assert_array_equal(d_ids[:n], pool[order])
        if n < d_scores.size:
            assert (d_scores[n:] <= 0.0).all()


def test_pool_kernel_empty_and_tiny_pools(engine):
    model = engine._vector_model
    built = model.built
    dev = _device_index(model)
    prep = model.prepare_stage1("alpha bravo")
    term_ids = [int(t) for t in np.asarray(prep[0]).tolist()]
    idfs = [float(v) for v in np.asarray(prep[1]).tolist()]
    jobs = [(np.array([0], np.int64), term_ids, idfs),
            (np.arange(5, dtype=np.int64), term_ids, idfs)]
    outs = dev.pool_score_collect(dev.pool_score_dispatch(jobs, 10))
    for (pool, t_ids, t_idfs), (d_scores, d_ids) in zip(jobs, outs):
        h = score_pool(built, t_ids, t_idfs, pool)
        order = np.argsort(-h, kind="stable")[:10]
        np.testing.assert_array_equal(d_scores[: order.size], h[order])
        np.testing.assert_array_equal(d_ids[: order.size], pool[order])


def test_batch_results_identical_host_vs_device_pool(monkeypatch):
    """End-to-end: force every multi-term query through the tier path and
    compare full facade results with pool scoring host-side vs
    device-side — they must be identical entry-for-entry."""
    eng = _build_engine(n_docs=400, seed=11)
    monkeypatch.setattr(cand_mod, "TIER_LANE_BUDGET", 1)

    queries = [Query("alpha bravo", 10), Query("charlie delta echo", 10),
               Query("kilo lima", 10), Query("mike november", 10),
               Query("golf hotel india", 10)]

    monkeypatch.setattr(VectorModel, "POOL_DEVICE", "0")
    res_host = eng.search_batch(queries)
    monkeypatch.setattr(VectorModel, "POOL_DEVICE", "1")
    res_dev = eng.search_batch(queries)

    for rh, rd in zip(res_host, res_dev):
        kh = [(r.document_id, r.score) for r in rh.records]
        kd = [(r.document_id, r.score) for r in rd.records]
        assert kh == kd


def test_select_pool_run_consistency(engine):
    """TieredStage1.run == select_pool + host scoring (refactor guard)."""
    model = engine._vector_model
    built = model.built
    tiered = TieredStage1(built, model.deleted_arr)
    prep = model.prepare_stage1("alpha bravo charlie")
    term_ids = [int(t) for t in np.asarray(prep[0]).tolist()]
    idfs = [float(v) for v in np.asarray(prep[1]).tolist()]
    sel = tiered.select_pool(term_ids, idfs, 25)
    out = tiered.run(term_ids, idfs, 25)
    assert (sel is None) == (out is None)
    if sel is None:
        return
    pool, lim = sel
    scores = score_pool(built, term_ids, idfs, pool)
    order = np.argsort(-scores, kind="stable")[:25]
    np.testing.assert_array_equal(out[0][: order.size], scores[order])
    np.testing.assert_array_equal(out[1][: order.size], pool[order])
    np.testing.assert_array_equal(out[2], lim)
