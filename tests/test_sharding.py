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


def test_sharded_coverage_matches_single_device():
    """Doc-sharded coverage+fusion == the single-device kernel (8-dev mesh)."""
    import numpy as np

    from infidex_tpu.coverage.setup import CoverageSetup
    from infidex_tpu.ops.coverage_kernel import (CoverageConfig,
                                                 CoverageTables,
                                                 coverage_fusion_batch,
                                                 encode_query_tokens)
    from infidex_tpu.parallel.sharding import (ShardedCoverageTables,
                                               make_mesh,
                                               sharded_coverage_batch)

    texts = [f"alpha bravo doc{i} charlie" for i in range(40)] + \
        ["delta echo"] * 8
    tables = CoverageTables.build([t.lower() for t in texts], {" "})
    config = CoverageConfig.from_setup(CoverageSetup.create_default())

    class Tok:
        def __init__(self, t, p):
            self.lower, self.position = t, p

    def enc(words, qp=4):
        toks = [Tok(w, i) for i, w in enumerate(words)]
        qc, qr, ql, _, qn, _ = encode_query_tokens(toks, qp)
        order = sorted(range(qn), key=lambda i: -ql[i])
        qs = np.full(qp, qn, np.int32)
        qs[: len(order)] = order
        return (qc, qr, ql, np.ones(qp, np.float32),
                np.ones(qp, np.float32), qn, qs)

    encs = [enc(["alpha", "brvo"]), enc(["delta"])]
    stk = lambda i: np.stack([e[i] for e in encs])
    q_args = (stk(0), stk(1), stk(2), stk(3), stk(4),
              np.array([e[5] for e in encs], np.int32), stk(6),
              stk(0), stk(1), stk(2),
              np.array([e[5] for e in encs], np.int32),
              np.array([False, False]))
    qlen = np.array([10, 5], np.int32)

    C = 48
    text_ids = np.arange(C, dtype=np.int32)
    qsel = (np.arange(C) % 2).astype(np.int32)
    lcs = np.zeros(C, np.float32)
    base = np.zeros(C, np.float32)

    ref = np.asarray(coverage_fusion_batch(
        tables.word_chars, tables.word_chars_rev, tables.word_lens,
        tables.doc_tokens, tables.doc_tok_offsets, tables.doc_tok_count,
        tables.doc_adj_ws, tables.doc_text_len, text_ids, qsel,
        *q_args, lcs, base, qlen, config=config))

    mesh = make_mesh(8)
    st = ShardedCoverageTables(tables, mesh)
    got = sharded_coverage_batch(st, text_ids, qsel, q_args, lcs, base,
                                 qlen, config)
    np.testing.assert_allclose(ref, got, atol=1e-5)
