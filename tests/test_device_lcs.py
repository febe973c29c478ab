"""Device fake-LCS (ops/coverage_kernel.py) vs host lcs (utils/metrics.py).

The kernel computes StringMetrics.cs:12-36 (containment-or-common-prefix
+ tolerance) from the [N, T] utf-16 text table; it must agree with the
host implementation exactly on its eligibility domain, and the pipeline
must produce identical results whether LCS comes from host or device.
"""

import random
import string

import numpy as np
import pytest

from infidex_tpu import Document, Query, SearchEngine
from infidex_tpu.ops.coverage_kernel import (
    CoverageTables, QT_LCS, encode_query_lcs)
from infidex_tpu.utils.metrics import lcs


def _device_lcs(texts, queries, tol):
    """Drive the kernel's lcs block in isolation via a tiny jit fn."""
    import jax
    import jax.numpy as jnp

    tables = CoverageTables.build([t.lower() for t in texts], {" "})
    n = len(texts)
    pairs = [(d, q) for d in range(n) for q in range(len(queries))]
    text_ids = np.array([p[0] for p in pairs], np.int32)
    qsel = np.array([p[1] for p in pairs], np.int32)
    q_arrs, q_lens, q_oks = [], [], []
    for q in queries:
        a, l, ok = encode_query_lcs(q.lower())
        q_arrs.append(a), q_lens.append(l), q_oks.append(ok)
    q_text = np.stack(q_arrs)
    q_text_len = np.array(q_lens, np.int32)
    q_ok = np.array(q_oks, np.bool_)
    text_len = np.array([len(t.lower()) for t in texts], np.int32)

    def f(txt_tab, qt, qtl, ttl):
        txt = txt_tab[text_ids].T.astype(jnp.int32)
        qtc = qt.T[:, qsel].astype(jnp.int32)
        qtlc = qtl[qsel]
        ttlc = ttl[text_ids]
        T_CAP = txt.shape[0]
        QT = qtc.shape[0]
        it = jnp.arange(QT, dtype=jnp.int32)[:, None]
        lim = jnp.minimum(qtlc, ttlc)[None]
        mism = (qtc != txt[:QT]) & (it < lim)
        any_m = mism.any(axis=0)
        prefix = jnp.where(any_m, jnp.argmax(mism, axis=0).astype(jnp.int32),
                           jnp.minimum(qtlc, ttlc))
        padded = jnp.concatenate([txt, jnp.zeros((QT,) + txt.shape[1:],
                                                 txt.dtype)], axis=0)

        def step(o, acc):
            sh = jax.lax.dynamic_slice_in_dim(padded, o, QT, axis=0)
            hit = ((sh == qtc) | (it >= qtlc[None])).all(axis=0)
            return acc | (hit & (o + qtlc <= ttlc))

        cont = jax.lax.fori_loop(0, T_CAP, step,
                                 jnp.zeros(qsel.shape, bool))
        pv = jnp.minimum(prefix + tol, jnp.minimum(qtlc, ttlc))
        val = jnp.where(cont, qtlc, jnp.where(prefix > 0, pv, 0))
        return jnp.where((qtlc > 0) & (ttlc > 0), val, 0)

    import jax

    out = np.asarray(jax.jit(f)(tables.text_chars, q_text,
                                q_text_len, text_len))
    eligible = tables.lcs_ok_host[text_ids] & q_ok[qsel]
    return pairs, out, eligible


def test_matches_host_on_random_strings():
    rng = random.Random(7)
    alpha = string.ascii_lowercase[:6] + " "
    texts = ["".join(rng.choice(alpha) for _ in range(rng.randrange(1, 40)))
             for _ in range(40)]
    texts += ["dark knight rises", "zelena skola", "abc", ""]
    queries = ["dark", "dark kni", "zelena", "ab", "q",
               "".join(rng.choice(alpha) for _ in range(5))]
    for tol in (0, 1, 2):
        pairs, out, eligible = _device_lcs(texts, queries, tol)
        for (d, q), got, ok in zip(pairs, out.tolist(), eligible.tolist()):
            if not ok:
                continue
            want = lcs(queries[q].lower(), texts[d].lower(), tol)
            assert got == want, (queries[q], texts[d], tol, got, want)


def test_eligibility_flags():
    long_text = "x" * 500
    surrogate = "ok \U0001F600 text"
    tables = CoverageTables.build([long_text, surrogate, "plain"], {" "})
    assert not tables.lcs_ok_host[0]     # longer than max T bucket
    assert not tables.lcs_ok_host[1]     # surrogate pair
    assert tables.lcs_ok_host[2]
    _, _, ok = encode_query_lcs("q" * (QT_LCS + 1))
    assert not ok
    _, _, ok2 = encode_query_lcs("fine query")
    assert ok2


def test_pipeline_parity_device_vs_host_lcs(monkeypatch):
    """Engine results identical with device LCS forced off (host path)."""
    docs = [Document(i, t) for i, t in enumerate(
        ["the dark knight", "dark knight rises", "darko visions",
         "knightfall chronicle", "a very long irrelevant title here",
         "zelena skola", "skola days", "random filler entry"] * 8)]
    eng = SearchEngine.create_default()
    eng.index_documents(docs)
    queries = ["dark kni", "darko", "zelena sk", "knightfal", "skola"]
    want = [[(r.document_id, r.score) for r in
             eng.search(Query(q, 10)).records] for q in queries]

    # force host LCS by marking every doc ineligible
    tables = eng.vector_model.coverage_tables
    monkeypatch.setattr(tables, "lcs_ok_host",
                        np.zeros_like(tables.lcs_ok_host))
    import jax.numpy as jnp
    monkeypatch.setattr(tables, "lcs_ok",
                        jnp.zeros_like(tables.lcs_ok))
    got = [[(r.document_id, r.score) for r in
            eng.search(Query(q, 10)).records] for q in queries]
    assert got == want
