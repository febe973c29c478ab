"""Device-resident inverted index + Stage-1 BM25+ scoring (JAX/XLA).

Behavioral reference: Infidex ``Indexing/Bm25Scorer.cs`` — BM25+ with
K1=1.2, B=0.75, delta=1.0 (:21-23), idf = ln((N-df+0.5)/(df+0.5)+1)
(:686-695), tf = byte-quantized field-weighted posting weight, and
dl/avgdl length normalization. The reference prunes with WAND/MaxScore
iterators (Bm25Scorer.cs:332-445) purely as a CPU-latency optimization;
scoring the full disjunctive union produces the same (or better) top-k.

TPU-native design: postings live in HBM as flat CSR tensors. A query is a
small set of (term_start, term_len, idf) triples; the kernel expands the
ragged posting ranges into one flat [L] lane space via searchsorted over
cumulative lengths, computes the BM25+ contribution per posting on the VPU,
scatter-adds into a dense [N] score vector, and takes top-k on device.
Fuzzy "virtual terms" (VectorModel.ExpandMissingTerm, :643-743) arrive as an
extra (doc_id, idf) posting buffer with implicit tf=1, matching
RoaringPostingsEnum's fixed Freq=1.0.

All shapes are bucketed powers of two so XLA compiles a small, reusable set
of programs.

Kernel strategy (measured on the real chip, scripts/profile_stage1.py):
the link round trip costs ~35ms/call and XLA's scatter-add ~12ns/lane, so
at 10k-100k docs every formulation is latency-floor-bound and at 1M docs
the win comes from not expanding millions of lanes at all — multi-term
known-token queries route to the host tier pools (index/candidates.py)
and device batches split at 4M lanes (also bounding remote compiles,
~100s for a 16M-lane program). A hand-written Pallas scatter cannot beat
XLA here: the TPU has no vectorized scatter primitive, so any in-kernel
accumulation serializes on the scalar core; the sort+segment-sum
reformulation measured 2.4x faster than scatter at 16M lanes but that
regime no longer occurs after tiering/splitting.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .builder import BuiltIndex

K1 = 1.2
B = 0.75
DELTA = 1.0

# Query-shape buckets: (max query terms, flat posting lanes, extra fuzzy lanes)
_MIN_L = 1024
_MIN_E = 1024
# Lane cap per kernel call: batches whose flat lane space would exceed
# this split into multiple calls. Bounds both compile time (a 16M-lane
# program takes ~100s to compile over a tunneled link) and the 4x
# quadrupling-bucket padding waste; an extra call costs ~35ms of link
# latency, far less than the padded scatter it avoids.
_MAX_L_PER_CALL = int(__import__("os").environ.get(
    "INFIDEX_TPU_MAX_LANES_PER_CALL", 4 * 1024 * 1024))


def compute_idf(total_docs: int, df: int) -> float:
    """BM25 idf (Bm25Scorer.ComputeIdf, :686-695), float32 semantics."""
    if df <= 0 or total_docs <= 0:
        return 0.0
    ratio = (np.float32(total_docs) - np.float32(df) + np.float32(0.5)) / (
        np.float32(df) + np.float32(0.5)
    )
    if ratio <= 0:
        return 0.0
    return float(np.log1p(ratio, dtype=np.float32))


#: low-id matcher window/count: alongside the score top-k, Stage-1 also
#: returns the LIM_K lowest doc ids (within the first LIM_WINDOW ids) of
#: the query's TOP QUALITY CLASS: docs matching as many distinct scoring
#: terms as any doc does, UNIONED with docs carrying any fuzzy-matched
#: vocab word (the per-token LD class — an exact count class is brittle
#: because incidental extra-gram tokens in unrelated docs raise the row
#: max above the class fusion actually ranks top). Fusion resolves the
#: class's quality ties by ascending key (ScoreEntry ordering), keys
#: BM25 order cannot predict: BM25's doc-length norm ranks the class's
#: short docs first, while fusion's tie winners are its lowest keys
#: (measured at 1M: typo-mode oracle docs at exact-BM25 rank 600-11000,
#: in no WordMatcher part). A plain score>0 test degenerates at corpus
#: scale — the lowest 256 positive-score ids are one-gram noise docs.
LIM_WINDOW = int(__import__("os").environ.get(
    "INFIDEX_TPU_LIM_WINDOW", 1 << 30))
LIM_K = int(__import__("os").environ.get("INFIDEX_TPU_LIM_K", 256))


# Diagnostic knobs (read at import): compile degraded Stage-1 variants so
# a TPU timing session can split the kernel's cost into phases — the
# scatter, the stable-tie second pass, and the LIM (cnt scatter +
# coverage class + masked top_k) block. NOT for serving: results lose
# the depth-stability / LIM guarantees.
_S1_PLAIN_TOPK = __import__('os').environ.get("INFIDEX_TPU_S1_PLAIN_TOPK") == "1"
_S1_NO_LIM = __import__('os').environ.get("INFIDEX_TPU_S1_NO_LIM") == "1"


def _s1_top_k(scores, k: int):
    if _S1_PLAIN_TOPK:
        return jax.lax.top_k(scores, k)
    return stable_top_k(scores, k)


def _s1_lim(m, k: int):
    if _S1_NO_LIM:
        return jnp.full((m.shape[0], k), float(1 << 24), jnp.float32)
    return _lim_rows(m, k)


#: elements per hierarchical-top-k block. Probed on the v5e at
#: [32, 1048576] k=500: plain lax.top_k ~56ms of device time per pass,
#: 64-block hierarchical ~35ms, and the win compounds across the
#: kernel's three top-k-class passes (score, boundary-tie, LIM).
_TOPK_BLOCK = int(__import__("os").environ.get(
    "INFIDEX_TPU_TOPK_BLOCK", 16384))


def _hier_top_k(v, k: int):
    """EXACT batched top-k via per-block top-k + merge.

    The true top-k of a row is contained in the union of the top-k of
    each of its S contiguous blocks, so two lax.top_k calls — [B*S, N/S]
    then [B, S*k] — return exactly the top-k VALUES (probe-verified
    equal to lax.top_k at 1M). Cheaper than one full-width pass because
    TPU's TopK cost grows superlinearly with the row length at k=500.
    Tie ORDER among equal values is implementation-defined exactly like
    lax.top_k's; callers needing deterministic tie membership mask with
    unique keys (stable_top_k / _lim_rows).

    Blocks are contiguous ascending id ranges, so when the underlying
    TopK breaks ties toward lower indices (XLA CPU), the merged order
    is also lower-id-first — the property the CPU parity tests pin."""
    B_, N_ = v.shape
    S = N_ // _TOPK_BLOCK
    if S <= 1 or N_ % _TOPK_BLOCK or k > _TOPK_BLOCK:
        return jax.lax.top_k(v, k)
    vb = v.reshape(B_ * S, _TOPK_BLOCK)
    ts, ti = jax.lax.top_k(vb, k)
    base = (jnp.arange(B_ * S, dtype=jnp.int32) % S) * _TOPK_BLOCK
    ti = ti + base[:, None]
    ts2, p = jax.lax.top_k(ts.reshape(B_, S * k), k)
    ids = jnp.take_along_axis(ti.reshape(B_, S * k), p, axis=1)
    return ts2, ids


def stable_top_k(scores, k: int):
    """top-k membership by (score desc, doc id asc) — EXACTLY, on device.

    ``jax.lax.top_k``'s tie order is not stable across k (different
    partial-sort schedules), so a query whose k-th score sits inside a
    large tie class samples DIFFERENT candidates at different depths —
    measured at 1M docs: 'yor' has ~87k docs in f32-identical tie
    classes, and the depth-500 candidate set missed docs the depth-20000
    oracle ranked top-3. Every strictly-above-boundary doc is in ANY
    top-k, so only the boundary tie class needs fixing: replace the tail
    with the class's LOWEST ids (a second, masked top_k — fusion's own
    tie order, and the one the host twins use). Membership is then
    deterministic and depth-nested. (A 64-bit packed-key single top_k
    would be simpler, but jax_enable_x64 is off.)

    The tie-class key tensor is F32, not int32: f32 top-k rides TPU's
    PartialReduce while int32 top_k falls back to a sort (~35ms+ over
    [32, 524288], ~90ms inside the fused Stage-1 kernel). Doc ids are
    exact in f32 below 2^24, the same bound the packed kernel output and
    the 1<<24 sentinel already assume. Both passes run hierarchically
    (_hier_top_k) — exact values, and the masked pass's keys are UNIQUE
    (the id iota), so selection is deterministic under any tie order."""
    one_d = scores.ndim == 1
    if one_d:
        scores = scores[None, :]
    n_pad = scores.shape[-1]
    ts, ti = _hier_top_k(scores, k)
    s_k = ts[:, k - 1 : k]                                  # [B, 1]
    n_above = (ts > s_k).sum(axis=1, keepdims=True)         # [B, 1]
    iota = jnp.arange(n_pad, dtype=jnp.float32)
    keym = jnp.where(scores == s_k, iota[None, :],
                     jnp.float32(1 << 24))
    low = (-_hier_top_k(-keym, k)[0]).astype(jnp.int32)     # id asc
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    tidx = jnp.clip(pos - n_above, 0, k - 1)
    fill_ids = jnp.take_along_axis(low, tidx, axis=1)
    out_ids = jnp.where(pos < n_above, ti, fill_ids)
    out_scores = jnp.where(pos < n_above, ts,
                           jnp.broadcast_to(s_k, ts.shape))
    if one_d:
        return out_scores[0], out_ids[0]
    return out_scores, out_ids


def _coverage_class(cnt, live_mask):
    """[n_q, N] bool: docs whose distinct-scoring-term count reaches the
    row maximum (the Stage-1 analogue of fusion's top quality class)."""
    cnt = cnt * live_mask[None, :]
    cmax = cnt.max(axis=1, keepdims=True)
    return (cnt >= cmax) & (cmax > 0.0)


def _lim_rows(m, k: int):
    """[n_q, k] lowest True positions of mask ``m`` (f32; pad 2^24).

    Masked top_k over the position iota: the same primitive (and cost
    class) as the score top-k the kernel already pays. A cumsum-based
    formulation was tried and measured 2.5x slower end-to-end at 1M docs
    — XLA lowers long-axis cumsum poorly on TPU. Keys are f32 (exact to
    2^24) so the top_k hits TPU's PartialReduce instead of the int32
    sort fallback (see stable_top_k)."""
    n_pad = m.shape[-1]
    w = min(LIM_WINDOW, n_pad)
    k2 = min(LIM_K, k)
    iota_w = jnp.arange(w, dtype=jnp.float32)
    key = jnp.where(m[:, :w], iota_w[None, :], jnp.float32(1 << 24))
    low = -_hier_top_k(-key, k2)[0]
    pad = jnp.full((m.shape[0], k - k2), float(1 << 24), jnp.float32)
    return jnp.concatenate([low, pad], axis=1)


def _bucket(n: int, minimum: int) -> int:
    """Quadrupling shape buckets: few distinct compiled programs, at most
    4x padding overhead (bandwidth-bound work tolerates it; compile time on
    tunneled TPUs does not tolerate many buckets)."""
    b = minimum
    while b < n:
        b *= 4
    return b


def _bucket2(n: int, minimum: int) -> int:
    """Doubling shape buckets for the DENSE axes (doc axis, batch width,
    fuzzy-group count): every [B, N]-shaped pass — the scatters, the
    fuzzy presence matrix, and the three top-k passes — pays padding
    waste LINEARLY, and at 1M docs the quadrupling bucket put n_pad at
    2.1M (2.1x) and a 27-query group at B=64 (2.4x): ~5x redundant dense
    work per call. Doubling caps the waste at 2x per axis for at most
    one extra compile bucket per axis (the doc axis has ONE value per
    corpus size at serving time anyway)."""
    b = minimum
    while b < n:
        b *= 2
    return b


@functools.partial(
    jax.jit,
    static_argnames=("l_pad", "e_pad", "k", "n_docs"),
)
def _stage1_kernel(
    postings_docs: jax.Array,     # int32 [P]
    postings_weights: jax.Array,  # uint8 [P]
    doc_lengths: jax.Array,       # f32 [N_pad]
    live_mask: jax.Array,         # f32 [N_pad] (1.0 live, 0.0 deleted/padding)
    term_starts: jax.Array,       # int32 [Q]
    term_lens: jax.Array,         # int32 [Q]
    term_idf: jax.Array,          # f32 [Q]
    extra_docs: jax.Array,        # int32 [e_pad]
    extra_idf: jax.Array,         # f32 [e_pad]
    avgdl: jax.Array,             # f32 scalar
    *,
    l_pad: int,
    e_pad: int,
    k: int,
    n_docs: int,
) -> Tuple[jax.Array, jax.Array]:
    """Dense disjunctive BM25+ over the query's postings; returns top-k."""
    n_pad = doc_lengths.shape[0]
    avgdl = jnp.maximum(avgdl, 1e-9)

    # --- ragged -> flat lane expansion ------------------------------------
    cum = jnp.cumsum(term_lens)                      # [Q]
    total = cum[-1]
    lane = jnp.arange(l_pad, dtype=jnp.int32)
    # term-of-lane via boundary scatter + cumsum: one O(L) pass instead of
    # searchsorted's log(Q) vector passes (saves ~60% of kernel time at
    # multi-million lane counts). Equivalent to searchsorted(cum, lane,
    # side="right"): term t's boundary at cum[t] bumps every later lane.
    boundary = jnp.zeros((l_pad,), jnp.int32).at[cum].add(1, mode="drop")
    term_of = jnp.cumsum(boundary)
    q = term_lens.shape[0]
    term_of_c = jnp.minimum(term_of, q - 1)
    prev = jnp.where(term_of_c > 0, cum[jnp.maximum(term_of_c - 1, 0)], 0)
    pos = lane - prev
    idx = term_starts[term_of_c] + pos
    valid = lane < total
    idx = jnp.where(valid, idx, 0)

    doc = postings_docs[idx]
    tf = postings_weights[idx].astype(jnp.float32)
    dl = doc_lengths[doc]
    dl = jnp.where(dl <= 0.0, 1.0, dl)

    norm = K1 * (1.0 - B + B * (dl / avgdl))
    contrib = term_idf[term_of_c] * ((tf * (K1 + 1.0)) / (tf + norm) + DELTA)
    contrib = jnp.where(valid, contrib, 0.0)
    doc = jnp.where(valid, doc, n_pad - 1)  # park invalid lanes on last slot

    scores = jnp.zeros((n_pad,), dtype=jnp.float32)
    scores = scores.at[doc].add(contrib, mode="drop")

    # --- fuzzy virtual-term postings (tf = 1.0) ----------------------------
    if e_pad > 0:
        edl = doc_lengths[extra_docs]
        edl = jnp.where(edl <= 0.0, 1.0, edl)
        enorm = K1 * (1.0 - B + B * (edl / avgdl))
        econtrib = extra_idf * ((K1 + 1.0) / (1.0 + enorm) + DELTA)
        scores = scores.at[extra_docs].add(econtrib, mode="drop")

    scores = scores * live_mask
    return stable_top_k(scores[:], k)


@functools.partial(
    jax.jit,
    static_argnames=("l_pad", "f_pad", "k", "n_q", "n_grp"),
)
def _stage1_kernel_batch(
    postings_docs: jax.Array,     # int32 [P]
    postings_weights: jax.Array,  # uint8 [P]
    doc_lengths: jax.Array,       # f32 [N_pad]
    live_mask: jax.Array,         # f32 [N_pad]
    term_starts: jax.Array,       # int32 [QT] (all queries' terms, flat)
    term_lens: jax.Array,         # int32 [QT]
    term_idf: jax.Array,          # f32 [QT]
    term_query: jax.Array,        # int32 [QT] owning query per term
    fz_starts: jax.Array,         # int32 [FT] fuzzy-matched vocab terms
    fz_lens: jax.Array,           # int32 [FT]
    fz_group: jax.Array,          # int32 [FT] owning fuzzy token (group)
    grp_query: jax.Array,         # int32 [n_grp] owning query per group
    total_docs: jax.Array,        # f32 scalar (live doc count, for idf)
    stop_limit: jax.Array,        # f32 scalar (stop-term df cap)
    avgdl: jax.Array,             # f32 scalar
    *,
    l_pad: int,
    f_pad: int,
    k: int,
    n_q: int,
    n_grp: int,
) -> Tuple[jax.Array, jax.Array]:
    """Multi-query Stage-1: B queries' postings in ONE flat lane space.

    Identical math to ``_stage1_kernel`` but the scatter target is the
    flattened [B * N_pad] score matrix (lane -> owning query via a second
    searchsorted-free gather: term_query[term_of]). One device round trip
    amortizes the host<->device link latency across the whole batch, and
    top-k runs batched on [B, N_pad].

    Fuzzy expansion (VectorModel.ExpandMissingTerm, :643-743) runs ON
    DEVICE from matched vocab-term ids: each fuzzy query token is a
    "group"; its matched terms' postings expand into a second lane space,
    scatter-MAX into a [n_grp, N] presence matrix (deduping the doc union
    exactly — contributions of one group are identical per doc), df =
    per-group presence count, idf = BM25 idf(df) with the 0<df<=stop_limit
    gate, and the per-query score update is ONE [n_q,n_grp]x[n_grp,N]
    matmul on the MXU. This replaces shipping materialized doc-id unions
    (10^5-10^6 ids/query at 1M docs) over the host link.
    """
    n_pad = doc_lengths.shape[0]
    avgdl = jnp.maximum(avgdl, 1e-9)

    cum = jnp.cumsum(term_lens)
    total = cum[-1]
    lane = jnp.arange(l_pad, dtype=jnp.int32)
    # boundary-cumsum lane->term mapping (see _stage1_kernel)
    boundary = jnp.zeros((l_pad,), jnp.int32).at[cum].add(1, mode="drop")
    term_of = jnp.cumsum(boundary)
    qt = term_lens.shape[0]
    term_of_c = jnp.minimum(term_of, qt - 1)
    prev = jnp.where(term_of_c > 0, cum[jnp.maximum(term_of_c - 1, 0)], 0)
    pos = lane - prev
    idx = term_starts[term_of_c] + pos
    valid = lane < total
    idx = jnp.where(valid, idx, 0)

    doc = postings_docs[idx]
    tf = postings_weights[idx].astype(jnp.float32)
    dl = doc_lengths[doc]
    dl = jnp.where(dl <= 0.0, 1.0, dl)

    norm = K1 * (1.0 - B + B * (dl / avgdl))
    contrib = term_idf[term_of_c] * ((tf * (K1 + 1.0)) / (tf + norm) + DELTA)
    contrib = jnp.where(valid, contrib, 0.0)
    qof = term_query[term_of_c]
    flat = jnp.where(valid, qof * n_pad + doc, n_pad - 1)

    scores = jnp.zeros((n_q * n_pad,), dtype=jnp.float32)
    scores = scores.at[flat].add(contrib, mode="drop")
    scores = scores.reshape(n_q, n_pad)
    # distinct-scoring-term count per doc (gram coverage; exact in f32):
    # postings are unique per (term, doc), so +1 per contributing lane.
    cnt = jnp.zeros((n_q * n_pad,), dtype=jnp.float32)
    cnt = cnt.at[flat].add(jnp.where(contrib > 0.0, 1.0, 0.0), mode="drop")
    cnt = cnt.reshape(n_q, n_pad)

    fz_any = None
    if f_pad > 0 and n_grp > 0:
        scores, cnt, fz_any = _fuzzy_block(
            scores, cnt, postings_docs, doc_lengths,
            fz_starts, fz_lens, fz_group, grp_query,
            total_docs, stop_limit, avgdl,
            f_pad=f_pad, n_grp=n_grp, n_q=n_q)

    scores = scores * live_mask[None, :]
    top_scores, top_ids = _s1_top_k(scores, k)
    m = _coverage_class(cnt, live_mask)
    if fz_any is not None:
        m = m | (fz_any & (live_mask[None, :] > 0.0))
    # One packed output = one host transfer (tunneled links pay a full
    # round trip per array). Doc ids are exact in f32 up to 2^24.
    return jnp.stack([top_scores, top_ids.astype(jnp.float32),
                      _s1_lim(m, k)])


def _fuzzy_block(scores, cnt, postings_docs, doc_lengths, fz_starts, fz_lens,
                 fz_group, grp_query, total_docs, stop_limit, avgdl,
                 *, f_pad: int, n_grp: int, n_q: int):
    """On-device fuzzy virtual-term scoring (see _stage1_kernel_batch
    docstring): expand matched vocab terms' postings into a [n_grp, N]
    presence matrix, derive per-group df/idf, and add the per-query
    contribution with one MXU matmul. Shared by the XLA and Pallas-chunked
    Stage-1 kernels. Also adds each scoring group's presence to the
    per-doc distinct-term count ``cnt`` (a second matmul over the same
    presence operand); returns (scores, cnt)."""
    n_pad = doc_lengths.shape[0]
    fcum = jnp.cumsum(fz_lens)
    ftotal = fcum[-1]
    flane = jnp.arange(f_pad, dtype=jnp.int32)
    fboundary = jnp.zeros((f_pad,), jnp.int32).at[fcum].add(1, mode="drop")
    f_of = jnp.cumsum(fboundary)
    ft = fz_lens.shape[0]
    f_of_c = jnp.minimum(f_of, ft - 1)
    fprev = jnp.where(f_of_c > 0, fcum[jnp.maximum(f_of_c - 1, 0)], 0)
    fidx = fz_starts[f_of_c] + (flane - fprev)
    fvalid = flane < ftotal
    fidx = jnp.where(fvalid, fidx, 0)
    fdoc = postings_docs[fidx]
    fgrp = fz_group[f_of_c]
    gflat = fgrp * n_pad + fdoc
    # scatter-max of {0,1}: invalid lanes contribute 0, so the parking
    # position never inflates a group's df.
    presence = jnp.zeros((n_grp * n_pad,), jnp.float32).at[gflat].max(
        jnp.where(fvalid, 1.0, 0.0), mode="drop")
    presence = presence.reshape(n_grp, n_pad)
    # virtual-term df = distinct posting docs (deleted included, like
    # the host union over raw postings); exact in f32 below 2^24.
    df = presence.sum(axis=1)
    ratio = (total_docs - df + jnp.float32(0.5)) / (df + jnp.float32(0.5))
    fidf = jnp.where((df > 0) & (df <= stop_limit) & (ratio > 0),
                     jnp.log1p(jnp.maximum(ratio, 0.0)), 0.0)
    dl_all = jnp.where(doc_lengths <= 0.0, 1.0, doc_lengths)
    fnorm = K1 * (1.0 - B + B * (dl_all / avgdl))
    doc_fac = (K1 + 1.0) / (1.0 + fnorm) + DELTA          # tf = 1.0
    own = grp_query[None, :] == jnp.arange(n_q, dtype=jnp.int32)[:, None]
    wsum = jnp.where(own, fidf[None, :], 0.0)             # [n_q, n_grp]
    csel = jnp.where(own & (fidf > 0.0)[None, :], 1.0, 0.0)
    fz_cnt = csel @ presence                              # [n_q, N]
    return (scores + wsum @ (presence * doc_fac[None, :]),
            cnt + fz_cnt, fz_cnt > 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("c_pad", "f_pad", "k", "n_q", "n_grp"),
)
def _stage1_kernel_batch_chunked(
    postings_docs: jax.Array,     # int32 [P + CHUNK]
    cfac: jax.Array,              # f32 [P + CHUNK] per-posting BM25 factor
    doc_lengths: jax.Array,       # f32 [N_pad]
    live_mask: jax.Array,         # f32 [N_pad]
    chunk_off: jax.Array,         # int32 [c_pad] (ALIGN-aligned)
    chunk_vstart: jax.Array,      # int32 [c_pad] valid-window start
    chunk_vend: jax.Array,        # int32 [c_pad] valid-window end
    chunk_idf: jax.Array,         # f32 [c_pad]
    chunk_base: jax.Array,        # int32 [c_pad] (query * n_pad)
    fz_starts: jax.Array,
    fz_lens: jax.Array,
    fz_group: jax.Array,
    grp_query: jax.Array,
    total_docs: jax.Array,
    stop_limit: jax.Array,
    avgdl: jax.Array,
    *,
    c_pad: int,
    f_pad: int,
    k: int,
    n_q: int,
    n_grp: int,
) -> jax.Array:
    """Pallas-expanded variant of ``_stage1_kernel_batch``: the ragged
    lane expansion + per-posting math run as a chunk-DMA Pallas kernel
    (ops/stage1_lanes.py — measured 2x faster end-to-end than the XLA
    boundary-cumsum + gather formulation at 4M lanes on a v5e); the
    scatter-add, fuzzy block and top-k stay in XLA. Scores match up to
    f32 scatter accumulation order (top-k ids identical in measurement;
    see stage1_lanes.py)."""
    from ..ops.stage1_lanes import expand_lanes

    n_pad = doc_lengths.shape[0]
    park = n_q * n_pad - 1
    keys, contrib = expand_lanes(chunk_off, chunk_vstart, chunk_vend,
                                 chunk_idf, chunk_base, postings_docs,
                                 cfac, park)
    scores = jnp.zeros((n_q * n_pad,), dtype=jnp.float32)
    scores = scores.at[keys].add(contrib, mode="drop")
    scores = scores.reshape(n_q, n_pad)
    # distinct-scoring-term count (parked/invalid lanes carry contrib 0)
    cnt = jnp.zeros((n_q * n_pad,), dtype=jnp.float32)
    cnt = cnt.at[keys].add(jnp.where(contrib > 0.0, 1.0, 0.0), mode="drop")
    cnt = cnt.reshape(n_q, n_pad)

    fz_any = None
    if f_pad > 0 and n_grp > 0:
        scores, cnt, fz_any = _fuzzy_block(
            scores, cnt, postings_docs, doc_lengths,
            fz_starts, fz_lens, fz_group, grp_query,
            total_docs, stop_limit, avgdl,
            f_pad=f_pad, n_grp=n_grp, n_q=n_q)

    scores = scores * live_mask[None, :]
    top_scores, top_ids = _s1_top_k(scores, k)
    m = _coverage_class(cnt, live_mask)
    if fz_any is not None:
        m = m | (fz_any & (live_mask[None, :] > 0.0))
    return jnp.stack([top_scores, top_ids.astype(jnp.float32),
                      _s1_lim(m, k)])


def _s1_traffic_bytes(lanes: int, lane_bytes: int, f_pad: int, n_grp: int,
                      n_q: int, n_pad: int) -> int:
    """COMPULSORY HBM traffic of one batched Stage-1 call, in bytes.

    A lower bound by construction — each term is data the program cannot
    avoid moving, regardless of fusion decisions:
      * lane expansion: ``lanes * lane_bytes`` posting reads (chunked
        path: 4B doc + 4B cfac = 8; XLA path: 4B doc + 1B weight + 4B
        doc-length gather = 9) plus an 8B read-modify-write into each of
        the scores and cnt scatter targets;
      * fuzzy block: 4B posting-doc read + 8B presence RMW per fuzzy
        lane, then the [n_grp, n_pad] presence matrix written once and
        read twice (df row-sum + the MXU matmul operand);
      * dense epilogue over the [n_q, n_pad] matrices: scores live-mask
        read+write, cnt read (coverage class), top-k scan read, LIM read
        — 5 passes of 4B.
    Real traffic is >= this (gather inefficiency, partial fusion), so
    achieved-GB/s computed from it UNDERSTATES true link utilization —
    safe for judging "is the device time explained by bandwidth".
    """
    b = lanes * (lane_bytes + 16)
    if f_pad > 0 and n_grp > 0:
        b += f_pad * 12 + n_grp * n_pad * 4 * 3
    b += n_q * n_pad * 4 * 5
    return b


def split_batch_by_lanes(built: BuiltIndex, queries,
                         cap: int = 0) -> list:
    """Contiguous (lo, hi) query groups whose lane totals fit the per-call
    cap. A single query may exceed the cap (it gets its own group and the
    larger bucket). Returns [(0, len(queries))] when no split is needed."""
    cap = cap or _MAX_L_PER_CALL
    built.ensure_champions()
    offsets = built.term_offsets
    cs, clen = built.champion_starts, built.champion_len

    def lane_count(ids: np.ndarray) -> int:
        if ids.size == 0:
            return 0
        full = (offsets[ids + 1] - offsets[ids]).astype(np.int64)
        if cs is not None:
            full = np.where(cs[ids] >= 0, clen, full)
        return int(full.sum())

    lanes = []
    for term_ids, _idf, fuzzy_groups in queries:
        n = lane_count(np.asarray(term_ids, dtype=np.int64))
        for grp in (fuzzy_groups or ()):
            n += lane_count(np.asarray(grp, dtype=np.int64))
        lanes.append(n)
    if sum(lanes) <= cap:
        return [(0, len(queries))]
    groups = []
    lo, acc = 0, 0
    for i, n in enumerate(lanes):
        if acc and acc + n > cap:
            groups.append((lo, i))
            lo, acc = i, 0
        acc += n
    groups.append((lo, len(queries)))
    return groups


def term_device_range(built: BuiltIndex, tid: int):
    """(start, len) of the term's device lanes: champion range for
    clipped high-df terms, full CSR range otherwise."""
    cs = built.champion_starts
    if cs is not None and cs[tid] >= 0:
        return int(cs[tid]), built.champion_len
    s = int(built.term_offsets[tid])
    return s, int(built.term_offsets[tid + 1]) - s


def prepare_batch_arrays(built: BuiltIndex, queries):
    """Host half of the batched Stage-1: flatten B queries' (term, idf)
    lists and fuzzy term-id groups into the padded CSR-range arrays the
    batch kernels consume. Shared by the single-chip DeviceIndex and the
    mesh-sharded index (parallel/sharding.py)."""
    n_q = len(queries)
    # Bucket the batch width so partial batches reuse a compiled program
    # (n_q is a static shape dim; pad rows cost a full dense [N] row of
    # scatter/top-k work each — doubling buckets, see _bucket2). Minimum
    # bucket is 1, not 4: the interactive path dispatches B=1 calls, and
    # padding those to 4 rows quadruples the dense scatter-target +
    # top-k epilogue (the whole device cost at 1M beyond the link floor)
    # for nothing. Serving batches (>=4 queries) are unaffected.
    n_q_pad = _bucket2(n_q, 1)

    starts_l, lens_l, idfs_l, tq_l = [], [], [], []
    fz_starts_p, fz_lens_p, fz_group_p = [], [], []
    grp_query_l: list = []
    built.ensure_champions()
    offsets = built.term_offsets
    cs = built.champion_starts
    clen = built.champion_len
    for qi, (term_ids, term_idf, fuzzy_groups) in enumerate(queries):
        for i, tid in enumerate(np.asarray(term_ids, dtype=np.int64)):
            s, n = term_device_range(built, int(tid))
            starts_l.append(s)
            lens_l.append(n)
            idfs_l.append(term_idf[i])
            tq_l.append(qi)
        for grp in (fuzzy_groups or ()):
            grp = np.asarray(grp, dtype=np.int64)
            if grp.size == 0:
                continue
            g = len(grp_query_l)
            grp_query_l.append(qi)
            s = offsets[grp].astype(np.int64)
            n = (offsets[grp + 1] - s).astype(np.int64)
            if cs is not None:
                champ = cs[grp]
                use = champ >= 0
                s = np.where(use, champ, s)
                n = np.where(use, clen, n)
            fz_starts_p.append(s.astype(np.int32))
            fz_lens_p.append(n.astype(np.int32))
            fz_group_p.append(np.full(grp.size, g, np.int32))

    qt = max(len(starts_l), 1)
    qt_pad = _bucket(qt, 8)
    starts = np.zeros(qt_pad, dtype=np.int32)
    lens = np.zeros(qt_pad, dtype=np.int32)
    idfs = np.zeros(qt_pad, dtype=np.float32)
    tq = np.zeros(qt_pad, dtype=np.int32)
    starts[: len(starts_l)] = starts_l
    lens[: len(lens_l)] = lens_l
    idfs[: len(idfs_l)] = idfs_l
    tq[: len(tq_l)] = tq_l

    total = int(lens.sum())
    l_pad = _bucket(max(total, 1), _MIN_L)

    n_groups = len(grp_query_l)
    if n_groups:
        fz_starts_all = np.concatenate(fz_starts_p)
        fz_lens_all = np.concatenate(fz_lens_p)
        fz_group_all = np.concatenate(fz_group_p)
        ft_pad = _bucket(int(fz_starts_all.size), 64)
        fz_starts = np.zeros(ft_pad, np.int32)
        fz_lens = np.zeros(ft_pad, np.int32)
        fz_group = np.zeros(ft_pad, np.int32)
        fz_starts[: fz_starts_all.size] = fz_starts_all
        fz_lens[: fz_lens_all.size] = fz_lens_all
        fz_group[: fz_group_all.size] = fz_group_all
        f_total = int(fz_lens_all.sum())
        f_pad = _bucket(max(f_total, 1), _MIN_E)
        # min bucket 1 (see n_q_pad): a lone fuzzy query pads its
        # [n_grp, N] presence matrix rows 4x otherwise.
        n_grp = _bucket2(n_groups, 1)
        grp_query = np.zeros(n_grp, np.int32)
        grp_query[:n_groups] = grp_query_l
    else:
        f_pad = 0
        n_grp = 0
        fz_starts = fz_lens = fz_group = np.zeros(0, np.int32)
        grp_query = np.zeros(0, np.int32)

    return (n_q_pad, starts, lens, idfs, tq, l_pad, fz_starts, fz_lens,
            fz_group, grp_query, f_pad, n_grp)


#: binary-search depth for the pool-score join: covers term posting
#: lists up to 2^21 docs (stop terms are dropped far earlier; one fixed
#: depth keeps a single compiled program per shape bucket).
_POOL_BSEARCH_BITS = 21


@functools.partial(jax.jit, static_argnames=("t_pad", "k"))
def _pool_score_kernel(
    postings_docs: jax.Array,     # int32 [P] (base CSR + champion ext)
    postings_weights: jax.Array,  # uint8 [P]
    doc_lengths: jax.Array,       # f32 [N_pad]
    pool: jax.Array,              # int32 [B, Pp] ascending; pad = N_pad-1
    pool_valid: jax.Array,        # bool [B, Pp]
    term_starts: jax.Array,       # int32 [B, T] FULL base CSR ranges
    term_lens: jax.Array,         # int32 [B, T]
    term_idf: jax.Array,          # f32 [B, T]
    avgdl: jax.Array,             # f32 scalar
    *,
    t_pad: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact BM25+ of host-selected candidate pools (device score_pool).

    Join strategy: per (query, pool doc, term), binary-search the doc in
    the term's doc-sorted posting range — log2(df) gathers per probe on
    the VPU, no lane expansion, so a 5k-doc pool over 300k total postings
    costs ~100k gathers instead of a 300k-lane scatter. Accumulation is
    in term order (fori_loop), the same f32 op order as the host/native
    ``candidates.score_pool`` — scores are bit-compatible, so routing a
    query host- or device-side cannot change its ranking.

    Top-k uses ``stable_top_k`` over pool POSITIONS: the pool is
    ascending, so position-ascending tie order == doc-id-ascending —
    identical to the host twin's stable argsort.
    """
    avgdl = jnp.maximum(avgdl, 1e-9)
    dl = doc_lengths[pool]
    dl = jnp.where(dl <= 0.0, 1.0, dl)
    norm = K1 * (1.0 - B + B * (dl / avgdl))          # [B, Pp]
    p_size = postings_docs.shape[0]

    def term_body(j, scores):
        s = term_starts[:, j][:, None]                 # [B, 1]
        n = term_lens[:, j][:, None]
        idf = term_idf[:, j][:, None]
        lo = jnp.zeros_like(pool)
        hi = jnp.broadcast_to(n, pool.shape)

        def bstep(_, lohi):
            lo_, hi_ = lohi
            mid = (lo_ + hi_) >> 1
            v = postings_docs[jnp.minimum(s + mid, p_size - 1)]
            lt = v < pool
            return jnp.where(lt, mid + 1, lo_), jnp.where(lt, hi_, mid)

        lo, _ = jax.lax.fori_loop(0, _POOL_BSEARCH_BITS, bstep, (lo, hi))
        at = jnp.minimum(s + lo, p_size - 1)
        found = (lo < n) & (postings_docs[at] == pool) & pool_valid
        tf = jnp.where(found, postings_weights[at].astype(jnp.float32), 0.0)
        contrib = idf * ((tf * (K1 + 1.0)) / (tf + norm) + DELTA)
        return scores + jnp.where(found, contrib, 0.0)

    scores = jax.lax.fori_loop(0, t_pad, term_body,
                               jnp.zeros_like(norm))
    top_scores, top_pos = stable_top_k(scores, k)
    top_ids = jnp.take_along_axis(pool, top_pos, axis=1)
    return top_scores, top_ids


class DeviceIndex:
    """HBM-resident CSR postings + jitted Stage-1 search."""

    def __init__(self, built: BuiltIndex, deleted: Optional[np.ndarray] = None):
        self.built = built
        built.ensure_champions()
        n = built.num_docs
        self.num_docs = n
        # Pad the doc axis so scatter targets and top-k are aligned; the last
        # slot doubles as the parking spot for invalid lanes.
        self.n_pad = max(_bucket2(n + 1, 8), 128)
        # Doc ids ride back packed into the f32 output row; f32 represents
        # integers exactly only up to 2^24 — fail loudly, never corrupt.
        if self.n_pad >= (1 << 24):
            raise ValueError(
                f"corpus too large for the packed f32 id path: n_pad="
                f"{self.n_pad} >= 2^24; shard the index across devices")

        # base CSR + champion extension in ONE buffer: clipped terms'
        # lanes point at their champion range (prepare_batch_arrays).
        # CHUNK trailing zeros keep the Pallas expansion's fixed-size DMAs
        # in bounds on the last chunk of a range (stage1_lanes.py), and
        # the whole buffer is padded to a quadrupling bucket so the
        # posting count is NOT a compiled-program shape: incremental
        # serving re-finalizes every few seconds, and an exact-P buffer
        # would invalidate every compiled kernel at each finalize
        # (measured: config-5 p50 fell from 55s to interactive).
        from ..ops.stage1_lanes import CHUNK as _CHUNK

        ext_d = built.ext_docs if built.ext_docs.size else np.zeros(1, np.int32)
        ext_w = (built.ext_weights if built.ext_weights.size
                 else np.zeros(1, np.uint8))
        p_pad = _bucket(ext_d.size + _CHUNK, 1 << 16)
        pd = np.zeros(p_pad, np.int32)
        pd[:ext_d.size] = ext_d
        pw = np.zeros(p_pad, np.uint8)
        pw[:ext_w.size] = ext_w
        self.postings_docs = jnp.asarray(pd)
        self.postings_weights = jnp.asarray(pw)
        self._cfac = None  # lazy per-posting BM25 factor (Pallas path)
        dl = np.zeros(self.n_pad, dtype=np.float32)
        dl[:n] = built.doc_lengths
        self.doc_lengths = jnp.asarray(dl)

        live = np.zeros(self.n_pad, dtype=np.float32)
        live[:n] = 1.0
        if deleted is not None and deleted.size >= n:
            live[:n] = np.where(deleted[:n], 0.0, 1.0)
        live[self.n_pad - 1] = 0.0  # parking slot never scores
        self.live_mask = jnp.asarray(live)

        self.avgdl = jnp.float32(built.avgdl)
        self._zero_extra = (
            jnp.zeros((0,), jnp.int32),
            jnp.zeros((0,), jnp.float32),
        )
        # filter-mask ∧ live-mask device buffers, keyed by mask identity
        # (pre-filtering: selective filters zero non-matching docs BEFORE
        # top-k instead of post-filtering 500 covered candidates)
        self._mask_cache: Dict[int, tuple] = {}
        # Pallas chunk-DMA lane expansion (stage1_lanes.py): on for real
        # TPU backends; the XLA formulation serves CPU/test runs (where
        # Mosaic kernels would need interpret mode) unless forced.
        flag = __import__("os").environ.get("INFIDEX_TPU_CHUNKED", "auto")
        if flag == "auto":
            self.use_chunked = jax.default_backend() in ("tpu", "axon")
        else:
            self.use_chunked = flag not in ("0", "off", "false")

    def _ensure_cfac(self):
        """Per-posting BM25 document factors for the Pallas path (lazy,
        computed on device once per index image)."""
        if self._cfac is None:
            from ..ops.stage1_lanes import posting_cfac

            self._cfac = jax.jit(posting_cfac)(
                self.postings_docs, self.postings_weights,
                self.doc_lengths, self.avgdl)
        return self._cfac

    def set_deleted(self, deleted: np.ndarray) -> None:
        live = np.zeros(self.n_pad, dtype=np.float32)
        live[: self.num_docs] = np.where(deleted[: self.num_docs], 0.0, 1.0)
        live[self.n_pad - 1] = 0.0
        self.live_mask = jnp.asarray(live)
        self._mask_cache.clear()

    def masked_live(self, mask: Optional[np.ndarray]):
        """live_mask ∧ filter-mask as a device buffer (cached per mask
        object so repeated filtered batches upload the [N] mask once)."""
        if mask is None:
            return self.live_mask
        key = id(mask)
        hit = self._mask_cache.get(key)
        if hit is not None and hit[0] is mask:
            return hit[1]
        m = np.zeros(self.n_pad, np.float32)
        k = min(int(mask.size), self.num_docs)
        m[:k] = mask[:k].astype(np.float32)
        buf = jnp.asarray(m) * self.live_mask
        if len(self._mask_cache) >= 16:
            self._mask_cache.clear()
        self._mask_cache[key] = (mask, buf)
        return buf

    def search(
        self,
        term_ids: np.ndarray,
        term_idf: np.ndarray,
        top_k: int,
        extra_docs: Optional[np.ndarray] = None,
        extra_idf: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Score query terms (by id) + optional fuzzy postings; return top-k.

        Returns (scores f32[k], internal doc ids int32[k]); entries with
        score <= 0 are non-matches.
        """
        built = self.built
        q = max(int(term_ids.size), 1)
        q_pad = _bucket(q, 8)

        starts = np.zeros(q_pad, dtype=np.int32)
        lens = np.zeros(q_pad, dtype=np.int32)
        idfs = np.zeros(q_pad, dtype=np.float32)
        for i, tid in enumerate(np.asarray(term_ids, dtype=np.int64)):
            s, n_lanes = term_device_range(built, int(tid))
            starts[i] = s
            lens[i] = n_lanes
            idfs[i] = term_idf[i]

        total = int(lens.sum())
        l_pad = _bucket(max(total, 1), _MIN_L)

        if extra_docs is not None and extra_docs.size > 0:
            e = int(extra_docs.size)
            e_pad = _bucket(e, _MIN_E)
            ed = np.full(e_pad, self.n_pad - 1, dtype=np.int32)
            ei = np.zeros(e_pad, dtype=np.float32)
            ed[:e] = extra_docs
            ei[:e] = extra_idf
            extra = (jnp.asarray(ed), jnp.asarray(ei))
        else:
            e_pad = 0
            extra = self._zero_extra

        k = min(int(top_k), self.n_pad)
        out = _stage1_kernel(
            self.postings_docs,
            self.postings_weights,
            self.doc_lengths,
            self.live_mask,
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(idfs),
            extra[0],
            extra[1],
            self.avgdl,
            l_pad=l_pad,
            e_pad=e_pad,
            k=k,
            n_docs=self.num_docs,
        )
        # One combined readback: the device<->host link may have high
        # per-round-trip latency (e.g. tunneled TPUs), so never transfer
        # outputs one array at a time.
        scores, ids = jax.device_get(out)
        return scores, ids

    def search_batch(
        self,
        queries,          # list of (term_ids, term_idf, fuzzy_groups)
        top_k: int,
        total_docs: Optional[int] = None,
        stop_term_limit: int = 1_250_000,
        live_override=None,   # device buffer from masked_live() (pre-filter)
    ) -> list:
        """Score B queries in ONE kernel call; returns [(scores, ids)] * B.

        Each query is (term_ids, term_idf, fuzzy_groups) where fuzzy_groups
        is a list of int arrays — the LD1-matched vocab term ids of each
        unknown query token. The union/df/idf of every fuzzy token is
        computed ON DEVICE from the CSR postings (see _stage1_kernel_batch),
        so only the matched term ids (<=1024/token) cross the host link.
        """
        built = self.built
        n_q = len(queries)
        if n_q == 0:
            return []

        # Flat scatter keys are query*n_pad + doc in int32: cap the batch
        # width so keys can't overflow into negatives (silently dropped
        # by mode="drop" otherwise). n_pad < 2^24, so max_q >= 128.
        max_q = max(1, ((1 << 31) - 1) // self.n_pad)
        if n_q > max_q:
            out = []
            for lo in range(0, n_q, max_q):
                out.extend(self.search_batch(
                    queries[lo:lo + max_q], top_k, total_docs=total_docs,
                    stop_term_limit=stop_term_limit,
                    live_override=live_override))
            return out

        # Lane-capped groups dispatch back-to-back BEFORE the first
        # readback: JAX dispatch is async, so the device pipelines the
        # group programs and the host pays ONE round-trip wait instead of
        # one per group (a 64-query 1M-doc batch splits into several
        # groups; sequential dispatch+get paid ~50ms of tunnel latency
        # per group).
        groups = split_batch_by_lanes(built, queries)
        handles = [
            self._dispatch_group(queries[lo:hi], top_k, total_docs,
                                 stop_term_limit, live_override)
            for lo, hi in groups]
        return self.search_batch_collect(handles)

    def search_batch_dispatch(
        self,
        queries,
        top_k: int,
        total_docs: Optional[int] = None,
        stop_term_limit: int = 1_250_000,
        live_override=None,
    ) -> list:
        """Async half of ``search_batch``: dispatch every lane-capped
        group program and return the device output handles WITHOUT
        waiting. Pair with ``search_batch_collect``; the split lets the
        batch pipeline (scoring/pipeline.py execute_batches_pipelined)
        run another batch's host work while these programs execute."""
        if not queries:
            return []
        max_q = max(1, ((1 << 31) - 1) // self.n_pad)
        handles: list = []
        for lo in range(0, len(queries), max_q):
            chunk = queries[lo:lo + max_q]
            for glo, ghi in split_batch_by_lanes(self.built, chunk):
                handles.append(self._dispatch_group(
                    chunk[glo:ghi], top_k, total_docs, stop_term_limit,
                    live_override))
        return handles

    def search_batch_collect(self, handles: list) -> list:
        """Blocking half of ``search_batch``: read back every dispatched
        group in dispatch order."""
        out: list = []
        for h in handles:
            out.extend(self._collect_group(h))
        return out

    def _dispatch_group(self, queries, top_k, total_docs,
                        stop_term_limit, live_override) -> dict:
        """Async half of one lane-capped Stage-1 kernel call: prepares
        host arrays and launches the jitted program, returning the device
        output handle without waiting."""
        built = self.built
        n_q = len(queries)
        import os as _os
        import time as _time
        trace = _os.environ.get("INFIDEX_TPU_TRACE")
        t0 = _time.perf_counter() if trace else 0.0

        (n_q_pad, starts, lens, idfs, tq, l_pad, fz_starts, fz_lens,
         fz_group, grp_query, f_pad, n_grp) = prepare_batch_arrays(
            built, queries)
        t_prep = (_time.perf_counter() - t0) if trace else 0.0

        td = np.float32(total_docs if total_docs is not None
                        else self.num_docs)
        k = min(int(top_k), self.n_pad)
        live = live_override if live_override is not None else self.live_mask
        if self.use_chunked:
            from ..ops.stage1_lanes import build_chunk_table

            off, vstart, vend, idf_c, base = build_chunk_table(
                starts, lens, idfs, tq, self.n_pad)
            c_pad = _bucket(max(off.size, 1), 64)
            co = np.zeros(c_pad, np.int32)
            cvs = np.zeros(c_pad, np.int32)
            cve = np.zeros(c_pad, np.int32)
            ci = np.zeros(c_pad, np.float32)
            cb = np.zeros(c_pad, np.int32)
            co[:off.size] = off
            cvs[:off.size] = vstart
            cve[:off.size] = vend
            ci[:off.size] = idf_c
            cb[:off.size] = base
            from ..ops.stage1_lanes import CHUNK as _CHUNK

            args = (
                self.postings_docs,
                self._ensure_cfac(),
                self.doc_lengths,
                live,
                jnp.asarray(co),
                jnp.asarray(cvs),
                jnp.asarray(cve),
                jnp.asarray(ci),
                jnp.asarray(cb),
                jnp.asarray(fz_starts),
                jnp.asarray(fz_lens),
                jnp.asarray(fz_group),
                jnp.asarray(grp_query),
                jnp.float32(td),
                jnp.float32(stop_term_limit),
                self.avgdl,
            )
            statics = dict(c_pad=c_pad, f_pad=f_pad, k=k, n_q=n_q_pad,
                           n_grp=n_grp)
            out = _stage1_kernel_batch_chunked(*args, **statics)
            self._last_s1 = dict(
                fn=_stage1_kernel_batch_chunked, args=args, statics=statics,
                td_index=13,
                bytes=_s1_traffic_bytes(c_pad * _CHUNK, 8, f_pad, n_grp,
                                        n_q_pad, self.n_pad))
            return dict(out=out, n_q=n_q, trace=trace, t0=t0,
                        t_prep=t_prep, t1=_time.perf_counter() if trace
                        else 0.0, desc=f"c_pad={c_pad} f_pad={f_pad} "
                        f"n_grp={n_grp}")
        args = (
            self.postings_docs,
            self.postings_weights,
            self.doc_lengths,
            live,
            jnp.asarray(starts),
            jnp.asarray(lens),
            jnp.asarray(idfs),
            jnp.asarray(tq),
            jnp.asarray(fz_starts),
            jnp.asarray(fz_lens),
            jnp.asarray(fz_group),
            jnp.asarray(grp_query),
            jnp.float32(td),
            jnp.float32(stop_term_limit),
            self.avgdl,
        )
        statics = dict(l_pad=l_pad, f_pad=f_pad, k=k, n_q=n_q_pad,
                       n_grp=n_grp)
        out = _stage1_kernel_batch(*args, **statics)
        self._last_s1 = dict(
            fn=_stage1_kernel_batch, args=args, statics=statics, td_index=12,
            bytes=_s1_traffic_bytes(l_pad, 9, f_pad, n_grp, n_q_pad,
                                    self.n_pad))
        import time as _time2
        return dict(out=out, n_q=n_q, trace=trace, t0=t0, t_prep=t_prep,
                    t1=_time2.perf_counter() if trace else 0.0,
                    desc=f"l_pad={l_pad} f_pad={f_pad} n_grp={n_grp}")

    def replay_last_s1(self, reps: int = 5):
        """Re-execute the most recent Stage-1 group call synchronously,
        ``reps`` times, returning (wall_seconds_list, compulsory_bytes).

        Bandwidth-utilization evidence: serving dispatches are async and
        pipelined, so per-kernel device time is not observable there; this
        replays the exact compiled program on the exact serving shapes
        with a blocking wait per call. The total-docs scalar is perturbed
        per rep (same shapes -> no recompile) because the tunneled backend
        memoizes identical executions. Returns None if no Stage-1 call has
        been dispatched yet."""
        import time as _time

        last = getattr(self, "_last_s1", None)
        if last is None:
            return None
        args = list(last["args"])
        ti = last["td_index"]
        walls = []
        for i in range(reps):
            args[ti] = jnp.float32(float(last["args"][ti]) + 1e-3 * (i + 1))
            t0 = _time.perf_counter()
            out = last["fn"](*args, **last["statics"])
            jax.block_until_ready(out)
            walls.append(_time.perf_counter() - t0)
        return walls, last["bytes"]

    @staticmethod
    def _collect_group(h: dict) -> list:
        """Blocking half: ONE combined readback of a dispatched group."""
        import time as _time

        packed = jax.device_get(h["out"])
        if h["trace"]:
            t2 = _time.perf_counter()
            print(f"[PIPE]     s1-call: s1prep={h['t_prep']*1000:.1f}ms "
                  f"s1dispatch={(h['t1']-h['t0']-h['t_prep'])*1000:.1f}ms "
                  f"s1wait={(t2-h['t1'])*1000:.1f}ms nq={h['n_q']} "
                  f"{h['desc']}", flush=True)
        scores = packed[0]
        ids = packed[1].astype(np.int32)
        lim = packed[2].astype(np.int32)
        return [(scores[b], ids[b], lim[b]) for b in range(h["n_q"])]

    # ---- tier-pool scoring (host-selected candidates, device BM25) ----
    #
    # The host tier path (index/candidates.py TieredStage1) selects a
    # few-thousand-doc candidate pool per heavy multi-term query; exact
    # BM25+ of that pool was the single largest host cost at 1M docs
    # (native score_pool ~1.3ms/query of the ~4.4ms/query host hot path,
    # scripts/host_r4b_lab.py). These kernels move that scoring onto the
    # device as a batched binary-search join over the FULL base CSR (no
    # champion clipping — same exactness as the host scorer), riding the
    # same async-dispatch pipeline as the main Stage-1 group call.

    def pool_score_dispatch(self, jobs, top_k: int):
        """Async: score B host-selected pools on device; returns a handle.

        ``jobs``: list of (pool int64[] ascending live doc ids,
        term_ids, term_idf). Scoring is exact over the full base CSR —
        bit-compatible with ``candidates.score_pool`` (same f32 op
        order; parity pinned by tests/test_pool_device.py). Pair with
        ``pool_score_collect``."""
        built = self.built
        n_jobs = len(jobs)
        if n_jobs == 0:
            return None
        b_pad = _bucket2(n_jobs, 4)
        p_max = max(int(np.asarray(j[0]).size) for j in jobs)
        p_pad = _bucket2(max(p_max, 1), 512)
        t_max = max(len(j[1]) for j in jobs)
        t_pad = _bucket(max(t_max, 1), 8)

        pool = np.full((b_pad, p_pad), self.n_pad - 1, np.int32)
        valid = np.zeros((b_pad, p_pad), bool)
        starts = np.zeros((b_pad, t_pad), np.int32)
        lens = np.zeros((b_pad, t_pad), np.int32)
        idfs = np.zeros((b_pad, t_pad), np.float32)
        offsets = built.term_offsets
        for b, (p, term_ids, term_idf) in enumerate(jobs):
            p = np.asarray(p)
            pool[b, : p.size] = p
            valid[b, : p.size] = True
            for j, tid in enumerate(np.asarray(term_ids, np.int64)):
                starts[b, j] = offsets[tid]
                lens[b, j] = offsets[tid + 1] - offsets[tid]
                idfs[b, j] = term_idf[j]
        k = min(int(top_k), p_pad)
        out = _pool_score_kernel(
            self.postings_docs, self.postings_weights, self.doc_lengths,
            jnp.asarray(pool), jnp.asarray(valid), jnp.asarray(starts),
            jnp.asarray(lens), jnp.asarray(idfs), self.avgdl,
            t_pad=t_pad, k=k)
        return dict(out=out, n=n_jobs)

    @staticmethod
    def pool_score_collect(handle):
        """Blocking half of ``pool_score_dispatch``: one combined
        readback; returns [(scores f32[k], ids int32[k])] per job."""
        if handle is None:
            return []
        scores, ids = jax.device_get(handle["out"])
        return [(scores[b], ids[b].astype(np.int32))
                for b in range(handle["n"])]
