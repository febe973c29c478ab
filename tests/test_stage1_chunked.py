"""Pallas chunk-DMA Stage-1 path == XLA Stage-1 path, bit for bit.

The chunked kernel (ops/stage1_lanes.py + _stage1_kernel_batch_chunked)
reformulates only the lane expansion; scores must be identical to the
XLA expansion (same f32 ops in the same order). Runs the Pallas kernel
in interpreter mode on the CPU backend (tests/conftest.py forces CPU).
"""

import os

import numpy as np
import pytest

os.environ["INFIDEX_TPU_PALLAS_INTERPRET"] = "1"

import jax.numpy as jnp

from infidex_tpu.index.builder import BuiltIndex
from infidex_tpu.index.device import DeviceIndex, compute_idf
from infidex_tpu.ops.stage1_lanes import (CHUNK, build_chunk_table,
                                          expand_lanes,
                                          expand_lanes_reference,
                                          posting_cfac)


def _random_index(rng, n_docs=700, n_terms=40):
    lens = rng.integers(0, 90, n_terms)
    lens[rng.integers(0, n_terms, 4)] = 0
    offsets = np.zeros(n_terms + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    P = int(offsets[-1])
    docs = np.sort(rng.integers(0, n_docs, P).astype(np.int32))
    weights = rng.integers(1, 255, P).astype(np.uint8)
    doc_lengths = (rng.random(n_docs) * 30 + 1).astype(np.float32)
    dfs = lens.astype(np.int32)
    return BuiltIndex(
        terms=[f"t{i}" for i in range(n_terms)],
        term_to_id={f"t{i}": i for i in range(n_terms)},
        term_offsets=offsets, postings_docs=docs,
        postings_weights=weights, df=dfs,
        doc_lengths=doc_lengths, avgdl=float(doc_lengths.mean()),
        num_docs=n_docs)


def test_expand_lanes_matches_reference():
    rng = np.random.default_rng(7)
    P, N = 50_000, 3000
    docs = rng.integers(0, N, P).astype(np.int32)
    w = rng.integers(1, 255, P).astype(np.uint8)
    dl = (rng.random(N) * 20 + 1).astype(np.float32)
    cfac = np.asarray(posting_cfac(jnp.asarray(docs), jnp.asarray(w),
                                   jnp.asarray(dl), 9.3))
    docs_p = np.concatenate([docs, np.zeros(CHUNK, np.int32)])
    cfac_p = np.concatenate([cfac, np.zeros(CHUNK, np.float32)])
    starts = rng.integers(0, P - 20000, 17)
    lens = rng.integers(0, 5000, 17)
    lens[2] = 0
    lens[5] = CHUNK          # exact-chunk boundary
    lens[6] = CHUNK + 1      # boundary + 1
    idfs = rng.random(17).astype(np.float32)
    qofs = rng.integers(0, 4, 17)
    off, vs, ve, idf_c, base = build_chunk_table(starts, lens, idfs, qofs, N)
    park = 4 * N - 1
    k1, c1 = expand_lanes(jnp.asarray(off), jnp.asarray(vs), jnp.asarray(ve),
                          jnp.asarray(idf_c), jnp.asarray(base),
                          jnp.asarray(docs_p), jnp.asarray(cfac_p), park)
    k2, c2 = expand_lanes_reference(off, vs, ve, idf_c, base, docs_p,
                                    cfac_p, park)
    assert np.array_equal(np.asarray(k1), k2)
    assert np.array_equal(np.asarray(c1), c2)


def test_chunk_table_covers_every_lane_once():
    from infidex_tpu.ops.stage1_lanes import ALIGN

    rng = np.random.default_rng(3)
    starts = rng.integers(0, 10**6, 50)
    lens = rng.integers(0, 3 * CHUNK, 50)
    off, vs, ve, _, _ = build_chunk_table(starts, lens, np.ones(50),
                                          np.zeros(50), 10)
    assert int((ve - vs).sum()) == int(lens.sum())
    # aligned chunk offsets; valid windows tile each range contiguously
    assert np.all(off % ALIGN == 0)
    pos = 0
    for t in range(50):
        s, l = int(starts[t]), int(lens[t])
        if l == 0:
            continue
        covered = []
        while pos < len(off) and off[pos] + vs[pos] <= s + l - 1 \
                and off[pos] >= (s // ALIGN) * ALIGN:
            covered.append((int(off[pos] + vs[pos]), int(off[pos] + ve[pos])))
            pos += 1
            if covered[-1][1] == s + l:
                break
        assert covered[0][0] == s
        assert covered[-1][1] == s + l
        for (a, b), (c, d) in zip(covered, covered[1:]):
            assert b == c


@pytest.mark.parametrize("seed", [0, 1])
def test_search_batch_chunked_equals_xla(seed):
    rng = np.random.default_rng(seed)
    built = _random_index(rng)
    queries = []
    for _ in range(5):
        tids = rng.choice(len(built.terms), size=rng.integers(1, 6),
                          replace=False)
        tids = [int(t) for t in tids if built.df[t] > 0]
        if not tids:
            tids = [int(np.argmax(built.df))]
        idfs = np.asarray([compute_idf(built.num_docs, int(built.df[t]))
                           for t in tids], np.float32)
        fuzzy = []
        if rng.random() < 0.5:
            grp = rng.choice(len(built.terms), size=3, replace=False)
            fuzzy.append(np.asarray(sorted(int(g) for g in grp), np.int64))
        queries.append((np.asarray(tids, np.int64), idfs, fuzzy))

    dev = DeviceIndex(built)
    dev.use_chunked = False
    ref = dev.search_batch(queries, 50)
    dev2 = DeviceIndex(built)
    dev2.use_chunked = True
    got = dev2.search_batch(queries, 50)
    for (rs, ri, rl), (gs, gi, gl) in zip(ref, got):
        assert np.array_equal(np.asarray(rs), np.asarray(gs))
        assert np.array_equal(np.asarray(ri), np.asarray(gi))
        assert np.array_equal(np.asarray(rl), np.asarray(gl))
