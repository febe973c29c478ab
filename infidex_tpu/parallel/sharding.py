"""Multi-chip sharded search over a jax.sharding.Mesh.

Design (SURVEY.md §2.11): documents (the score axis) are sharded across
devices; postings are replicated (they stream from HBM per query term).
Candidate generation is embarrassingly parallel over document shards — each
device scatter-adds the BM25 contributions of the postings that land in its
shard, computes a local top-k, and the per-shard top-k lists are merged with
an all-gather + final top-k. This is the TPU analogue of Infidex's
per-segment search + heap merge (VectorModel.cs:573-585), with XLA
collectives riding ICI.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older JAX
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.device import B, DELTA, K1, stable_top_k

DOC_AXIS = "docs"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (DOC_AXIS,))



def _stable_merge(all_s, all_i, k: int):
    """Global top-k of gathered per-shard (score, id) rows by
    (score desc, id asc) — the device.py stable_top_k boundary-class
    treatment applied to the ICI merge, so sharded candidate sets are
    deterministic and depth-nested exactly like single-chip ones. Each
    shard's local selection is stable, so the global boundary class's
    lowest ids are always among the gathered rows."""
    one_d = all_s.ndim == 1
    if one_d:
        all_s, all_i = all_s[None, :], all_i[None, :]
    ts, tpos = jax.lax.top_k(all_s, k)
    ti = jnp.take_along_axis(all_i, tpos, axis=1)
    s_k = ts[:, k - 1 : k]
    n_above = (ts > s_k).sum(axis=1, keepdims=True)
    keym = jnp.where(all_s == s_k, all_i, jnp.int32(1 << 24))
    low = -jax.lax.top_k(-keym, k)[0]
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]
    tidx = jnp.clip(pos - n_above, 0, k - 1)
    fill = jnp.take_along_axis(low, tidx, axis=1)
    out_i = jnp.where(pos < n_above, ti, fill)
    out_s = jnp.where(pos < n_above, ts, jnp.broadcast_to(s_k, ts.shape))
    if one_d:
        return out_s[0], out_i[0]
    return out_s, out_i


@functools.partial(
    jax.jit,
    static_argnames=("l_pad", "k", "mesh", "n_pad"),
)
def sharded_stage1_topk(
    postings_docs: jax.Array,     # int32 [P]      (replicated)
    postings_weights: jax.Array,  # uint8 [P]      (replicated)
    doc_lengths: jax.Array,       # f32 [n_pad]    (sharded over docs)
    live_mask: jax.Array,         # f32 [n_pad]    (sharded over docs)
    term_starts: jax.Array,       # int32 [Q]
    term_lens: jax.Array,         # int32 [Q]
    term_idf: jax.Array,          # f32 [Q]
    avgdl: jax.Array,             # f32 scalar
    *,
    l_pad: int,
    k: int,
    mesh: Mesh,
    n_pad: int,
) -> Tuple[jax.Array, jax.Array]:
    """Shard-parallel BM25 scoring + distributed top-k merge.

    Returns (scores[k], doc_ids[k]) replicated on every device.
    """
    n_dev = mesh.shape[DOC_AXIS]
    shard_size = n_pad // n_dev

    def per_shard(p_docs, p_weights, dl_shard, live_shard,
                  starts, lens, idf, avg):
        my_idx = jax.lax.axis_index(DOC_AXIS)
        base = my_idx * shard_size

        cum = jnp.cumsum(lens)
        total = cum[-1]
        lane = jnp.arange(l_pad, dtype=jnp.int32)
        term_of = jnp.searchsorted(cum, lane, side="right").astype(jnp.int32)
        q = lens.shape[0]
        term_of_c = jnp.minimum(term_of, q - 1)
        prev = jnp.where(term_of_c > 0, cum[jnp.maximum(term_of_c - 1, 0)], 0)
        idx = starts[term_of_c] + (lane - prev)
        valid = lane < total
        idx = jnp.where(valid, idx, 0)

        doc = p_docs[idx]
        local = doc - base
        in_shard = valid & (local >= 0) & (local < shard_size)
        local = jnp.where(in_shard, local, shard_size - 1)

        tf = p_weights[idx].astype(jnp.float32)
        dl = dl_shard[local]
        dl = jnp.where(dl <= 0.0, 1.0, dl)
        avg = jnp.maximum(avg, 1e-9)
        norm = K1 * (1.0 - B + B * (dl / avg))
        contrib = idf[term_of_c] * ((tf * (K1 + 1.0)) / (tf + norm) + DELTA)
        contrib = jnp.where(in_shard, contrib, 0.0)

        scores = jnp.zeros((shard_size,), jnp.float32).at[local].add(
            contrib, mode="drop")
        scores = scores * live_shard

        k_local = min(k, shard_size)
        top_s, top_i = stable_top_k(scores, k_local)
        top_i = top_i + base

        # ICI merge: gather every shard's stable top-k, merge by
        # (score desc, global id asc).
        all_s = jax.lax.all_gather(top_s, DOC_AXIS, tiled=True)
        all_i = jax.lax.all_gather(top_i, DOC_AXIS, tiled=True)
        return _stable_merge(all_s, all_i, k)

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(DOC_AXIS), P(DOC_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(postings_docs, postings_weights, doc_lengths, live_mask,
              term_starts, term_lens, term_idf, avgdl)


@functools.partial(
    jax.jit,
    static_argnames=("l_pad", "f_pad", "k", "n_q", "n_grp", "mesh", "n_pad"),
)
def sharded_stage1_batch(
    postings_docs: jax.Array,     # int32 [P]   (replicated)
    postings_weights: jax.Array,  # uint8 [P]   (replicated)
    doc_lengths: jax.Array,       # f32 [n_pad] (doc-sharded)
    live_mask: jax.Array,         # f32 [n_pad] (doc-sharded)
    term_starts: jax.Array,       # int32 [QT]
    term_lens: jax.Array,         # int32 [QT]
    term_idf: jax.Array,          # f32 [QT]
    term_query: jax.Array,        # int32 [QT]
    fz_starts: jax.Array,         # int32 [FT]
    fz_lens: jax.Array,           # int32 [FT]
    fz_group: jax.Array,          # int32 [FT]
    grp_query: jax.Array,         # int32 [n_grp]
    total_docs: jax.Array,        # f32 scalar
    stop_limit: jax.Array,        # f32 scalar
    avgdl: jax.Array,             # f32 scalar
    *,
    l_pad: int,
    f_pad: int,
    k: int,
    n_q: int,
    n_grp: int,
    mesh: Mesh,
    n_pad: int,
) -> jax.Array:
    """Mesh version of ``_stage1_kernel_batch`` (index/device.py).

    Every device expands the SAME flat lane space but scatters only the
    postings landing in its document shard; fuzzy virtual-term df is the
    ``psum`` of per-shard presence counts (the exact global df, so idf is
    bit-identical to single-chip); per-shard [B, shard] top-k lists merge
    with one all-gather. The analogue of Infidex's per-segment search +
    heap merge (VectorModel.cs:573-585), collectives riding ICI.
    """
    n_dev = mesh.shape[DOC_AXIS]
    shard_size = n_pad // n_dev

    def per_shard(p_docs, p_weights, dl_shard, live_shard,
                  starts, lens, idf, tq, f_starts, f_lens, f_group,
                  g_query, td, stop, avg):
        my_idx = jax.lax.axis_index(DOC_AXIS)
        base = my_idx * shard_size
        avg = jnp.maximum(avg, 1e-9)

        cum = jnp.cumsum(lens)
        total = cum[-1]
        lane = jnp.arange(l_pad, dtype=jnp.int32)
        boundary = jnp.zeros((l_pad,), jnp.int32).at[cum].add(1, mode="drop")
        term_of = jnp.cumsum(boundary)
        qt = lens.shape[0]
        term_of_c = jnp.minimum(term_of, qt - 1)
        prev = jnp.where(term_of_c > 0, cum[jnp.maximum(term_of_c - 1, 0)], 0)
        idx = starts[term_of_c] + (lane - prev)
        valid = lane < total
        idx = jnp.where(valid, idx, 0)

        doc = p_docs[idx]
        local = doc - base
        in_shard = valid & (local >= 0) & (local < shard_size)
        local_c = jnp.where(in_shard, local, shard_size - 1)

        tf = p_weights[idx].astype(jnp.float32)
        dl = dl_shard[local_c]
        dl = jnp.where(dl <= 0.0, 1.0, dl)
        norm = K1 * (1.0 - B + B * (dl / avg))
        contrib = idf[term_of_c] * ((tf * (K1 + 1.0)) / (tf + norm) + DELTA)
        contrib = jnp.where(in_shard, contrib, 0.0)
        qof = tq[term_of_c]
        flat = jnp.where(in_shard, qof * shard_size + local_c,
                         shard_size - 1)
        scores = jnp.zeros((n_q * shard_size,), jnp.float32).at[flat].add(
            contrib, mode="drop")
        scores = scores.reshape(n_q, shard_size)
        # distinct-scoring-term count per doc (device.py cnt twin)
        cnt = jnp.zeros((n_q * shard_size,), jnp.float32).at[flat].add(
            jnp.where(contrib > 0.0, 1.0, 0.0), mode="drop")
        cnt = cnt.reshape(n_q, shard_size)

        if f_pad > 0 and n_grp > 0:
            fcum = jnp.cumsum(f_lens)
            ftotal = fcum[-1]
            flane = jnp.arange(f_pad, dtype=jnp.int32)
            fboundary = jnp.zeros((f_pad,), jnp.int32).at[fcum].add(
                1, mode="drop")
            f_of = jnp.cumsum(fboundary)
            ft = f_lens.shape[0]
            f_of_c = jnp.minimum(f_of, ft - 1)
            fprev = jnp.where(f_of_c > 0, fcum[jnp.maximum(f_of_c - 1, 0)], 0)
            fidx = f_starts[f_of_c] + (flane - fprev)
            fvalid = flane < ftotal
            fidx = jnp.where(fvalid, fidx, 0)
            fdoc = p_docs[fidx]
            flocal = fdoc - base
            f_in = fvalid & (flocal >= 0) & (flocal < shard_size)
            flocal_c = jnp.where(f_in, flocal, shard_size - 1)
            fgrp = f_group[f_of_c]
            gflat = fgrp * shard_size + flocal_c
            presence = jnp.zeros((n_grp * shard_size,), jnp.float32).at[
                gflat].max(jnp.where(f_in, 1.0, 0.0), mode="drop")
            presence = presence.reshape(n_grp, shard_size)
            # global df: psum of per-shard presence counts over ICI
            df = jax.lax.psum(presence.sum(axis=1), DOC_AXIS)
            ratio = (td - df + jnp.float32(0.5)) / (df + jnp.float32(0.5))
            fidf = jnp.where((df > 0) & (df <= stop) & (ratio > 0),
                             jnp.log1p(jnp.maximum(ratio, 0.0)), 0.0)
            dl_all = jnp.where(dl_shard <= 0.0, 1.0, dl_shard)
            fnorm = K1 * (1.0 - B + B * (dl_all / avg))
            doc_fac = (K1 + 1.0) / (1.0 + fnorm) + DELTA
            own = g_query[None, :] == jnp.arange(n_q, dtype=jnp.int32)[:, None]
            wsum = jnp.where(own, fidf[None, :], 0.0)
            scores = scores + wsum @ (presence * doc_fac[None, :])
            csel = jnp.where(own & (fidf > 0.0)[None, :], 1.0, 0.0)
            fz_cnt = csel @ presence
            cnt = cnt + fz_cnt
            fz_any = fz_cnt > 0.0
        else:
            fz_any = None

        scores = scores * live_shard[None, :]
        k_local = min(k, shard_size)
        top_s, top_i = stable_top_k(scores, k_local)
        top_i = top_i + base

        # ICI merge: every shard contributes its stable local top-k per
        # query; merge by (score desc, global id asc).
        all_s = jax.lax.all_gather(top_s, DOC_AXIS, tiled=True, axis=1)
        all_i = jax.lax.all_gather(top_i, DOC_AXIS, tiled=True, axis=1)
        g_s, g_i = _stable_merge(all_s, all_i, k)

        # low-id matcher rows (device.py _lim_rows twin): per-shard
        # lowest GLOBAL ids of the maximum-gram-coverage class (global
        # row max via ICI pmax), merged over ICI — identical to the
        # single-chip rows (parity pinned by tests/test_sharded_engine.py).
        from ..index.device import LIM_K, LIM_WINDOW

        cnt = cnt * live_shard[None, :]
        gmax = jax.lax.pmax(cnt.max(axis=1), DOC_AXIS)      # [n_q]
        in_class = (cnt >= gmax[:, None]) & (gmax[:, None] > 0.0)
        if fz_any is not None:
            in_class = in_class | (fz_any & (live_shard[None, :] > 0.0))
        k2 = min(LIM_K, k_local)
        gids = base + jnp.arange(shard_size, dtype=jnp.int32)
        # f32 keys (exact below 2^24) keep the per-shard low-id top_k on
        # TPU's PartialReduce path (index/device.py stable_top_k note).
        keym = jnp.where(in_class & (gids[None, :] < LIM_WINDOW),
                         gids[None, :].astype(jnp.float32),
                         jnp.float32(1 << 24))
        low_l = (-jax.lax.top_k(-keym, k2)[0]).astype(jnp.int32)
        all_low = jax.lax.all_gather(low_l, DOC_AXIS, tiled=True, axis=1)
        k2g = min(LIM_K, k)
        glow = -jax.lax.top_k(-all_low, k2g)[0]
        pad = jnp.full((glow.shape[0], k - k2g), 1 << 24, jnp.int32)
        lim_row = jnp.concatenate([glow, pad], axis=1).astype(jnp.float32)
        return jnp.stack([g_s, g_i.astype(jnp.float32), lim_row])

    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(DOC_AXIS), P(DOC_AXIS),
                  P(), P(), P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(postings_docs, postings_weights, doc_lengths, live_mask,
              term_starts, term_lens, term_idf, term_query,
              fz_starts, fz_lens, fz_group, grp_query,
              total_docs, stop_limit, avgdl)


class ShardedDeviceIndex:
    """Document-sharded index image for an N-device mesh."""

    def __init__(self, built, mesh: Mesh, deleted: Optional[np.ndarray] = None):
        self.built = built
        self.mesh = mesh
        n = built.num_docs
        n_dev = mesh.shape[DOC_AXIS]
        # Pad doc axis to a multiple of 8 * n_devices (+ parking slot room).
        unit = 8 * n_dev
        self.n_pad = max(((n + 1 + unit - 1) // unit) * unit, unit)

        # Doc ids ride back packed into the f32 output row (exact <= 2^24).
        if self.n_pad >= (1 << 24):
            raise ValueError(
                f"corpus too large for the packed f32 id path: n_pad="
                f"{self.n_pad} >= 2^24; widen the mesh or split the index")

        repl = NamedSharding(self.mesh, P())
        doc_sharded = NamedSharding(self.mesh, P(DOC_AXIS))

        built.ensure_champions()
        self.postings_docs = jax.device_put(
            jnp.asarray(built.ext_docs if built.ext_docs.size
                        else np.zeros(1, np.int32)), repl)
        self.postings_weights = jax.device_put(
            jnp.asarray(built.ext_weights if built.ext_weights.size
                        else np.zeros(1, np.uint8)), repl)

        dl = np.zeros(self.n_pad, np.float32)
        dl[:n] = built.doc_lengths
        live = np.zeros(self.n_pad, np.float32)
        live[:n] = 1.0
        if deleted is not None and deleted.size >= n:
            live[:n] = np.where(deleted[:n], 0.0, 1.0)
        live[self.n_pad - 1] = 0.0
        self.doc_lengths = jax.device_put(jnp.asarray(dl), doc_sharded)
        self.live_mask = jax.device_put(jnp.asarray(live), doc_sharded)
        self.avgdl = jnp.float32(built.avgdl)

    def set_deleted(self, deleted: np.ndarray) -> None:
        n = self.built.num_docs
        live = np.zeros(self.n_pad, np.float32)
        live[:n] = np.where(deleted[:n], 0.0, 1.0)
        live[self.n_pad - 1] = 0.0
        self.live_mask = jax.device_put(
            jnp.asarray(live), NamedSharding(self.mesh, P(DOC_AXIS)))

    def search(self, term_ids: np.ndarray, term_idf: np.ndarray,
               top_k: int) -> Tuple[np.ndarray, np.ndarray]:
        built = self.built
        q = max(int(np.asarray(term_ids).size), 1)
        q_pad = 8
        while q_pad < q:
            q_pad *= 2
        starts = np.zeros(q_pad, np.int32)
        lens = np.zeros(q_pad, np.int32)
        idfs = np.zeros(q_pad, np.float32)
        from ..index.device import term_device_range

        for i, tid in enumerate(np.asarray(term_ids, dtype=np.int64)):
            s, n_lanes = term_device_range(built, int(tid))
            starts[i] = s
            lens[i] = n_lanes
            idfs[i] = term_idf[i]
        l_pad = 1024
        total = int(lens.sum())
        while l_pad < total:
            l_pad *= 2
        k = min(int(top_k), self.n_pad)
        scores, ids = sharded_stage1_topk(
            self.postings_docs, self.postings_weights,
            self.doc_lengths, self.live_mask,
            jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(idfs),
            self.avgdl, l_pad=l_pad, k=k, mesh=self.mesh, n_pad=self.n_pad)
        return np.asarray(scores), np.asarray(ids)

    def search_batch(
        self,
        queries,          # list of (term_ids, term_idf, fuzzy_groups)
        top_k: int,
        total_docs: Optional[int] = None,
        stop_term_limit: int = 1_250_000,
        live_override=None,   # unused: the sharded path post-filters
    ) -> list:
        """Mesh twin of ``DeviceIndex.search_batch`` — same host prep, same
        output convention, scoring sharded over the document axis.

        ``live_override`` (single-chip pre-filtering) is accepted for
        interface parity but ignored: the engine disables pre-filtering
        under sharded serving (stage1_live_override returns None) and
        filtered queries post-filter, as the reference always does."""
        from ..index.device import prepare_batch_arrays, split_batch_by_lanes

        n_q = len(queries)
        if n_q == 0:
            return []
        # int32 flat-key overflow cap, as in DeviceIndex.search_batch
        shard_size = self.n_pad // max(self.mesh.shape[DOC_AXIS], 1)
        max_q = max(1, ((1 << 31) - 1) // max(shard_size, 1))
        if n_q > max_q:
            out = []
            for lo in range(0, n_q, max_q):
                out.extend(self.search_batch(
                    queries[lo:lo + max_q], top_k, total_docs=total_docs,
                    stop_term_limit=stop_term_limit))
            return out
        groups = split_batch_by_lanes(self.built, queries)
        if len(groups) > 1:
            out: list = []
            for lo, hi in groups:
                out.extend(self.search_batch(
                    queries[lo:hi], top_k, total_docs=total_docs,
                    stop_term_limit=stop_term_limit))
            return out
        (n_q_pad, starts, lens, idfs, tq, l_pad, fz_starts, fz_lens,
         fz_group, grp_query, f_pad, n_grp) = prepare_batch_arrays(
            self.built, queries)
        td = np.float32(total_docs if total_docs is not None
                        else self.built.num_docs)
        k = min(int(top_k), self.n_pad)
        out = sharded_stage1_batch(
            self.postings_docs, self.postings_weights,
            self.doc_lengths, self.live_mask,
            jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(idfs),
            jnp.asarray(tq),
            jnp.asarray(fz_starts), jnp.asarray(fz_lens),
            jnp.asarray(fz_group), jnp.asarray(grp_query),
            jnp.float32(td), jnp.float32(stop_term_limit), self.avgdl,
            l_pad=l_pad, f_pad=f_pad, k=k, n_q=n_q_pad, n_grp=n_grp,
            mesh=self.mesh, n_pad=self.n_pad)
        packed = np.asarray(jax.device_get(out))
        scores = packed[0]
        ids = packed[1].astype(np.int32)
        lim = packed[2].astype(np.int32)
        return [(scores[b], ids[b], lim[b]) for b in range(n_q)]


# ======================================================================
# Sharded Stage-2/3: coverage+fusion over document-sharded token tables.
#
# Candidates are routed to the device owning their document's table rows
# (host-side bucketing by shard), every shard scores its residents with the
# SAME coverage kernel (ops/coverage_kernel.py) over its local table slice,
# and the packed [3, C/n] outputs ride out of the shard_map sharded — the
# host stitches the original order back. Queries are replicated (tiny).


class ShardedCoverageTables:
    """Document-sharded image of ops.coverage_kernel.CoverageTables."""

    def __init__(self, tables, mesh: Mesh):
        self.mesh = mesh
        n_dev = mesh.shape[DOC_AXIS]
        n = int(tables.doc_tokens.shape[0])
        self.n_pad = ((n + n_dev - 1) // n_dev) * n_dev
        self.shard_size = self.n_pad // n_dev

        repl = NamedSharding(mesh, P())
        doc_sharded = NamedSharding(mesh, P(DOC_AXIS))

        def pad_docs(arr):
            arr = np.asarray(arr)
            out = np.zeros((self.n_pad,) + arr.shape[1:], arr.dtype)
            out[:n] = arr
            return out

        self.word_chars = jax.device_put(tables.word_chars, repl)
        self.word_chars_rev = jax.device_put(tables.word_chars_rev, repl)
        self.word_lens = jax.device_put(tables.word_lens, repl)
        self.doc_tokens = jax.device_put(
            jnp.asarray(pad_docs(tables.doc_tokens)), doc_sharded)
        self.doc_tok_offsets = jax.device_put(
            jnp.asarray(pad_docs(tables.doc_tok_offsets)), doc_sharded)
        self.doc_tok_count = jax.device_put(
            jnp.asarray(pad_docs(tables.doc_tok_count)), doc_sharded)
        self.doc_adj_ws = jax.device_put(
            jnp.asarray(pad_docs(tables.doc_adj_ws)), doc_sharded)
        self.doc_text_len = jax.device_put(
            jnp.asarray(pad_docs(tables.doc_text_len)), doc_sharded)


def sharded_coverage_batch(sharded_tables: ShardedCoverageTables,
                           text_ids: np.ndarray, qsel: np.ndarray,
                           q_args: tuple, lcs_vals: np.ndarray,
                           base_scores: np.ndarray, query_len: np.ndarray,
                           config) -> np.ndarray:
    """Score candidates of B queries across the mesh; returns packed
    [3, C] (score, tiebreaker, word_hits) in the input candidate order.

    Each device runs the single-chip coverage kernel over the candidates
    whose documents live in its table shard — compute scales 1/n_dev with
    zero inter-chip traffic during scoring (only the output gather).
    """
    from ..ops.coverage_kernel import coverage_fusion_batch

    mesh = sharded_tables.mesh
    n_dev = mesh.shape[DOC_AXIS]
    shard_size = sharded_tables.shard_size
    C = int(text_ids.shape[0])

    # Host routing: bucket candidates by owning shard, equal-pad buckets.
    shard_of = np.asarray(text_ids) // shard_size
    order = np.argsort(shard_of, kind="stable")
    counts = np.bincount(shard_of, minlength=n_dev)
    per = max(int(counts.max()), 1)

    r_text = np.zeros((n_dev, per), np.int32)
    r_qsel = np.zeros((n_dev, per), np.int32)
    r_lcs = np.zeros((n_dev, per), np.float32)
    r_base = np.zeros((n_dev, per), np.float32)
    slot_of = np.zeros(C, np.int64)   # candidate -> (shard, slot)
    fill = np.zeros(n_dev, np.int64)
    for pos in order:
        s = int(shard_of[pos])
        j = int(fill[s]); fill[s] += 1
        r_text[s, j] = int(text_ids[pos]) - s * shard_size   # LOCAL id
        r_qsel[s, j] = qsel[pos]
        r_lcs[s, j] = lcs_vals[pos]
        r_base[s, j] = base_scores[pos]
        slot_of[pos] = s * per + j

    def per_shard(tok, off, cnt, adj, tlen, wch, wrev, wlen,
                  tids, qs, lc, bs, *q_and_len):
        qa = q_and_len[:-1]
        qlen = q_and_len[-1]
        return coverage_fusion_batch(
            wch, wrev, wlen, tok, off, cnt, adj, tlen,
            tids[0], qs[0], *qa, lc[0], bs[0], qlen, config=config)

    st = sharded_tables
    fn = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(DOC_AXIS), P(DOC_AXIS), P(DOC_AXIS), P(DOC_AXIS),
                  P(DOC_AXIS),                      # doc tables
                  P(), P(), P(),                    # word tables (replicated)
                  P(DOC_AXIS), P(DOC_AXIS), P(DOC_AXIS), P(DOC_AXIS),
                  *([P()] * (len(q_args) + 1))),    # queries + query_len
        out_specs=P(None, DOC_AXIS),
        check_vma=False,
    )
    out = fn(st.doc_tokens, st.doc_tok_offsets, st.doc_tok_count,
             st.doc_adj_ws, st.doc_text_len,
             st.word_chars, st.word_chars_rev, st.word_lens,
             jnp.asarray(r_text), jnp.asarray(r_qsel),
             jnp.asarray(r_lcs), jnp.asarray(r_base),
             *[jnp.asarray(a) for a in q_args], jnp.asarray(query_len))
    packed = np.asarray(jax.device_get(out))        # [3, n_dev * per]
    return packed[:, slot_of]
