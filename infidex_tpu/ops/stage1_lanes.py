"""Pallas lane-expansion kernel for Stage-1 BM25+ scoring.

The dense Stage-1 disjunction (index/device.py) must turn B queries'
ragged posting ranges into a flat lane space of (doc, contribution)
pairs. The pure-XLA formulation pays ~29ns/lane for the boundary-scatter
+ cumsum lane->term mapping and ~50ns/lane for the `postings[idx]`
gathers (measured on a v5e: 75ms of a 102ms kernel at 1M lanes) — XLA
lowers the index arithmetic to serial-ish scans and the *contiguous-run*
gathers to generic random gathers.

This kernel exploits the structure XLA can't see: every query term's
lanes are ONE contiguous slice of the CSR buffers. The host splits the
ranges into fixed ``CHUNK``-lane pieces (a tiny numpy table); the kernel
grid walks the chunks, DMAs each contiguous slice HBM->VMEM at line
rate, and emits per-lane scatter keys (query*N + doc) and BM25
contributions (idf * cfac).

``cfac`` is the per-posting document factor precomputed once per index
build: ``(tf*(K1+1))/(tf + K1*(1-B+B*dl/avgdl)) + DELTA`` — exactly the
inner expression of Bm25Scorer.cs's per-posting score (the idf
multiplier stays per-query). Per-lane values are bit-identical to the
in-kernel computation; accumulated scores can differ from the XLA
formulation in the last ulp (XLA does not pin scatter-add accumulation
order), measured 2e-7 relative with identical top-k ids on a v5e.

Behavioral reference: Infidex ``Indexing/Bm25Scorer.cs:21-23,686-695``
(constants + idf); the chunked layout mirrors
``Segments/BlockPostingsWriter.cs``'s fixed-block posting walks.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

CHUNK = int(os.environ.get("INFIDEX_TPU_LANE_CHUNK", "2048"))
assert CHUNK % 1024 == 0 and CHUNK > 0, "CHUNK must be a multiple of 1024"
_SUB = CHUNK // 128    # VMEM tile rows per chunk

K1 = 1.2
B = 0.75
DELTA = 1.0


def posting_cfac(postings_docs: jax.Array, postings_weights: jax.Array,
                 doc_lengths: jax.Array, avgdl) -> jax.Array:
    """Per-posting BM25+ document factor, f32 (see module docstring)."""
    tf = postings_weights.astype(jnp.float32)
    dl = doc_lengths[postings_docs]
    dl = jnp.where(dl <= 0.0, 1.0, dl)
    avgdl = jnp.maximum(jnp.float32(avgdl), 1e-9)
    norm = K1 * (1.0 - B + B * (dl / avgdl))
    return (tf * (K1 + 1.0)) / (tf + norm) + DELTA


#: Mosaic tiles 1D HBM memrefs by 1024 elements; DMA slice starts must be
#: tile-aligned, so chunks start at align-down(range start) and carry a
#: [vstart, vend) valid window instead of a plain count.
ALIGN = 1024


def build_chunk_table(starts: np.ndarray, lens: np.ndarray,
                      idfs: np.ndarray, qofs: np.ndarray,
                      n_pad: int) -> Tuple[np.ndarray, np.ndarray,
                                           np.ndarray, np.ndarray,
                                           np.ndarray]:
    """Split per-term CSR ranges into ALIGN-aligned CHUNK-lane pieces
    (host, vectorized).

    Returns (chunk_off, chunk_vstart, chunk_vend, chunk_idf, chunk_base):
    aligned posting offset, the chunk's valid lane window, query idf and
    flat scatter-key base (query * n_pad). Zero-length terms produce no
    chunks; lanes outside [vstart, vend) are parked by the kernel.
    """
    starts = np.asarray(starts, np.int64)
    lens = np.asarray(lens, np.int64)
    off0 = (starts // ALIGN) * ALIGN
    lead = starts - off0
    span = np.where(lens > 0, lead + lens, 0)
    n_chunks = (span + CHUNK - 1) // CHUNK
    total = int(n_chunks.sum())
    if total == 0:
        z = np.zeros(0, np.int32)
        return z, z, z, np.zeros(0, np.float32), z
    term_of = np.repeat(np.arange(lens.size), n_chunks)
    bounds = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    ci = np.arange(total, dtype=np.int64) - np.repeat(bounds, n_chunks)
    off = off0[term_of] + ci * CHUNK
    vstart = np.maximum(lead[term_of] - ci * CHUNK, 0)
    vend = np.minimum(span[term_of] - ci * CHUNK, CHUNK)
    return (off.astype(np.int32), vstart.astype(np.int32),
            vend.astype(np.int32),
            np.asarray(idfs, np.float32)[term_of],
            (np.asarray(qofs, np.int64)[term_of] * n_pad).astype(np.int32))


def _interpret() -> bool:
    """Interpreter mode for non-TPU backends (tests run the same kernel
    semantics on CPU)."""
    if os.environ.get("INFIDEX_TPU_PALLAS_INTERPRET"):
        return True
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=("park",))
def _expand_call(chunk_off, chunk_vstart, chunk_vend, chunk_idf, chunk_base,
                 postings_docs, cfac, *, park: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_c = chunk_off.shape[0]

    def kernel(off_ref, vs_ref, ve_ref, idf_ref, base_ref,
               docs_hbm, cfac_hbm, keys_ref, contrib_ref,
               docs_s0, cfac_s0, docs_s1, cfac_s1, sems):
        c = pl.program_id(0)
        n_cp = pl.num_programs(0)
        # Mosaic can't dynamically slice a VMEM slot axis that shares a
        # tile, so the two buffers are separate refs selected by parity.
        is0 = jax.lax.rem(c, 2) == 0

        def copies(i, docs_s, cfac_s, k):
            start = pl.multiple_of(off_ref[i], ALIGN)
            return (pltpu.make_async_copy(docs_hbm.at[pl.ds(start, CHUNK)],
                                          docs_s, sems.at[k, 0]),
                    pltpu.make_async_copy(cfac_hbm.at[pl.ds(start, CHUNK)],
                                          cfac_s, sems.at[k, 1]))

        # double buffering: chunk c+1's DMA flies while chunk c computes
        @pl.when(c == 0)
        def _():
            for dma in copies(0, docs_s0, cfac_s0, 0):
                dma.start()

        @pl.when((c + 1 < n_cp) & is0)
        def _():
            for dma in copies(c + 1, docs_s1, cfac_s1, 1):
                dma.start()

        @pl.when((c + 1 < n_cp) & jnp.logical_not(is0))
        def _():
            for dma in copies(c + 1, docs_s0, cfac_s0, 0):
                dma.start()

        def emit(docs_s, cfac_s, k):
            for dma in copies(c, docs_s, cfac_s, k):
                dma.wait()
            docs = docs_s[:].reshape(_SUB, 128)
            cf = cfac_s[:].reshape(_SUB, 128)
            rows = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 128), 1)
            lane = rows * 128 + cols
            valid = (lane >= vs_ref[c]) & (lane < ve_ref[c])
            contrib_ref[0] = jnp.where(valid, idf_ref[c] * cf, 0.0)
            keys_ref[0] = jnp.where(valid, base_ref[c] + docs, park)

        @pl.when(is0)
        def _():
            emit(docs_s0, cfac_s0, 0)

        @pl.when(jnp.logical_not(is0))
        def _():
            emit(docs_s1, cfac_s1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_c,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((1, _SUB, 128), lambda c, *_: (c, 0, 0)),
                   pl.BlockSpec((1, _SUB, 128), lambda c, *_: (c, 0, 0))),
        scratch_shapes=[pltpu.VMEM((CHUNK,), jnp.int32),
                        pltpu.VMEM((CHUNK,), jnp.float32),
                        pltpu.VMEM((CHUNK,), jnp.int32),
                        pltpu.VMEM((CHUNK,), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
    )
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_c, _SUB, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n_c, _SUB, 128), jnp.float32)),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(chunk_off, chunk_vstart, chunk_vend, chunk_idf, chunk_base,
      postings_docs, cfac)


def expand_lanes(chunk_off, chunk_vstart, chunk_vend, chunk_idf, chunk_base,
                 postings_docs, cfac, park: int):
    """Flat (scatter keys, contributions) for all chunks' lanes.

    ``postings_docs``/``cfac`` must carry >= CHUNK trailing pad elements
    so the last chunk's fixed-size DMA never reads out of bounds.
    """
    keys, contrib = _expand_call(chunk_off, chunk_vstart, chunk_vend,
                                 chunk_idf, chunk_base, postings_docs,
                                 cfac, park=park)
    return keys.reshape(-1), contrib.reshape(-1)


def expand_lanes_reference(chunk_off, chunk_vstart, chunk_vend, chunk_idf,
                           chunk_base, postings_docs, cfac, park: int):
    """Pure-numpy oracle of expand_lanes for parity tests."""
    keys = np.full((len(chunk_off), CHUNK), park, np.int32)
    contrib = np.zeros((len(chunk_off), CHUNK), np.float32)
    docs = np.asarray(postings_docs)
    cf = np.asarray(cfac)
    for c in range(len(chunk_off)):
        vs, ve = int(chunk_vstart[c]), int(chunk_vend[c])
        s = int(chunk_off[c])
        keys[c, vs:ve] = chunk_base[c] + docs[s + vs:s + ve]
        contrib[c, vs:ve] = chunk_idf[c] * cf[s + vs:s + ve]
    return keys.reshape(-1), contrib.reshape(-1)
