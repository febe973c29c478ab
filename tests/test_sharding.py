"""Multi-device sharded search == single-device search (8-device CPU mesh)."""

import numpy as np
import pytest

import jax

from infidex_tpu import Document
from infidex_tpu.index.device import compute_idf
from infidex_tpu.index.vector_model import VectorModel
from infidex_tpu.parallel.sharding import ShardedDeviceIndex, make_mesh
from infidex_tpu.tokenization.normalizer import TextNormalizer
from infidex_tpu.tokenization.tokenizer import Tokenizer, TokenizerSetup


@pytest.fixture(scope="module")
def model():
    tok = Tokenizer([3], 2, 0, TextNormalizer.create_default(), TokenizerSetup())
    m = VectorModel(tok)
    rng = np.random.default_rng(42)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    for i in range(200):
        text = " ".join(rng.choice(words, size=rng.integers(2, 6)))
        m.index_document(Document(i, text))
    m.build_inverted_lists()
    return m


def test_sharded_matches_single(model):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    sharded = ShardedDeviceIndex(model.built, mesh)

    tokens = model.tokenizer.tokenize_for_search("alpha bravo")
    term_ids, idfs = [], []
    seen = set()
    for t in tokens:
        tid = model.term_dict.get_id(t)
        if tid >= 0 and tid not in seen:
            df = int(model.built.df[tid])
            if df > 0:
                seen.add(tid)
                term_ids.append(tid)
                idfs.append(compute_idf(model.documents.count, df))

    s_scores, s_ids = sharded.search(
        np.array(term_ids), np.array(idfs, np.float32), 20)
    d_scores, d_ids = model.device.search(
        np.array(term_ids), np.array(idfs, np.float32), 20)

    # Same scored set (ties may order differently across merges)
    np.testing.assert_allclose(
        np.sort(s_scores)[::-1], np.sort(d_scores)[::-1], rtol=1e-5)
    matched_s = {(int(i)) for s, i in zip(s_scores, s_ids) if s > 0}
    matched_d = {(int(i)) for s, i in zip(d_scores, d_ids) if s > 0}
    # Top sets agree on everything above the tie boundary
    min_common = min(len(matched_s), len(matched_d))
    assert len(matched_s & matched_d) >= min_common - 3


def test_mesh_shapes(model):
    mesh = make_mesh(8)
    sharded = ShardedDeviceIndex(model.built, mesh)
    assert sharded.n_pad % (8 * 8) == 0
