"""Batched Stage-2/3 coverage + fusion scoring on the VPU.

This is the TPU-native replacement for the per-candidate matcher cascade
(Coverage/*.cs + Scoring/FusionScorer.cs): all candidates of a query are
scored in ONE jitted program over char tensors.

Data layout (built at index finalize):
  word_chars  int32 [W, L]  lowercase code units of every unique doc word
  word_lens   int32 [W]
  doc_tokens  int32 [N, D]  per-doc token code sequence (-1 padded)
  doc_tok_offsets int32 [N, D]  char offset of each token in the text
  doc_tok_count   int32 [N]
  doc_adj_ws  bool  [N, D]  gap between token j and j+1 is whitespace-only
  doc_text_len int32 [N]

Compile-time structure: all pairwise string primitives (equality, prefix,
suffix, containment, edit distances) are precomputed as [C, Q, D] tensors in
a handful of fused sweeps (ops/editdistance_multi.py provides the banded
multi-query Damerau); the sequential matcher cascade then runs as small
fori_loop bodies of pure mask algebra, so the traced graph stays compact.

Replicates, bit-for-bit against the host oracle (coverage/engine.py +
scoring/fusion.py, themselves exact ports of the reference):
  1. whole-word -> joined -> prefix/suffix -> fuzzy cascade with
     single-consumption token deactivation,
  2. CoverageScorer.CalculateFinalScore,
  3. FusionSignalComputer.ComputeSignals,
  4. FusionScorer.Calculate -> (score, tiebreaker).

Candidates whose shapes exceed the static capacities (tokens > D, token
chars > L, query tokens > Q) are flagged and re-scored by the host oracle.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .editdistance_multi import (alignment_tensors, batched_lev_multi,
                                 damerau_rescue)

# Static capacities
D_MAX = 64    # doc tokens per candidate
L_MAX = 24    # chars per token
Q_MAX = 16    # coverage query tokens
FQ_MAX = 16   # fusion (unfiltered) query tokens
D_CAP_NARROW = 16  # narrow doc-token program width (see CoverageConfig.d_cap)
D_CAP_SMALL = 8    # small-bucket doc-token width (short docs, short words)
L_CAP_SMALL = 12   # small-bucket char width (all words <= 12 chars)

# Device fake-LCS (StringMetrics.cs:12-36) shape caps. The text axis is
# the smallest bucket holding the corpus' longest (eligible) text, so
# title corpora pay a [N, 64] table while long-field corpora grow to
# [N, 256]; longer docs fall back to the host LCS per candidate.
T_LCS_BUCKETS = (64, 128, 192, 256)
QT_LCS = 64        # full-query char cap for the device fake-LCS

INTENT_BONUS_PER_SIGNAL = 0.15
ANCHOR_STEM_LENGTH = 3
MAX_TRAILING_LEN = 2


class CoverageConfig(NamedTuple):
    """Static CoverageSetup knobs baked into the compiled kernel."""

    min_word_size: int = 2
    levenshtein_max_word_size: int = 20
    num_typos: int = 2
    min_length_one_typo: int = 3
    min_length_two_typos: int = 7
    cover_whole_query: bool = True
    cover_whole_words: bool = True
    cover_fuzzy_words: bool = True
    cover_joined_words: bool = True
    cover_prefix_suffix: bool = True
    # Doc-token axis cap: 0 = full table width. The caller routes
    # candidates whose tok_count <= d_cap to a program compiled with the
    # smaller D — most tensors are O(D) or O(D^2), so a 16-wide program
    # does ~4-16x less work than the 64-wide one on short documents.
    d_cap: int = 0

    @staticmethod
    def from_setup(s) -> "CoverageConfig":
        return CoverageConfig(
            min_word_size=s.min_word_size,
            levenshtein_max_word_size=s.levenshtein_max_word_size,
            num_typos=s.num_typos,
            min_length_one_typo=s.min_length_one_typo,
            min_length_two_typos=s.min_length_two_typos,
            cover_whole_query=s.cover_whole_query,
            cover_whole_words=s.cover_whole_words,
            cover_fuzzy_words=s.cover_fuzzy_words,
            cover_joined_words=s.cover_joined_words,
            cover_prefix_suffix=s.cover_prefix_suffix,
        )


def _pad_bucket(n: int, minimum: int = 1024) -> int:
    b = minimum
    while b < n:
        b *= 4
    return b


#: row-count buckets for incremental appends: updates pad to one of
#: these so a handful of compiled update programs serve every finalize
#: (an exact-K program per finalize would recompile continuously).
_APPEND_BUCKETS = (16, 64, 256, 1024, 4096)


def _append_bucket(n: int) -> int:
    for b in _APPEND_BUCKETS:
        if n <= b:
            return b
    return n  # very large appends: one exact-size compile


@functools.partial(jax.jit, donate_argnums=tuple(range(10)))
def _append_update(word_chars, word_chars_rev, word_lens, doc_tokens,
                   doc_tok_offsets, doc_tok_count, doc_adj_ws, doc_text_len,
                   text_chars, lcs_ok,
                   wc_u, wcr_u, wl_u, dt_u, do_u, dc_u, da_u, dtl_u,
                   tc_u, lok_u, w_start, d_start):
    """In-place (donated) row updates for every device table: only the
    delta rows transfer host->device; the tables' HBM buffers are reused.
    Pad rows in the updates re-write existing pad rows with identical
    content, so logical state is unchanged beyond the delta."""
    dus = jax.lax.dynamic_update_slice
    if wl_u.shape[0]:
        word_chars = dus(word_chars, wc_u, (w_start, 0))
        word_chars_rev = dus(word_chars_rev, wcr_u, (w_start, 0))
        word_lens = dus(word_lens, wl_u, (w_start,))
    doc_tokens = dus(doc_tokens, dt_u, (d_start, 0))
    doc_tok_offsets = dus(doc_tok_offsets, do_u, (d_start, 0))
    doc_tok_count = dus(doc_tok_count, dc_u, (d_start,))
    doc_adj_ws = dus(doc_adj_ws, da_u, (d_start, 0))
    doc_text_len = dus(doc_text_len, dtl_u, (d_start,))
    text_chars = dus(text_chars, tc_u, (d_start, 0))
    lcs_ok = dus(lcs_ok, lok_u, (d_start,))
    return (word_chars, word_chars_rev, word_lens, doc_tokens,
            doc_tok_offsets, doc_tok_count, doc_adj_ws, doc_text_len,
            text_chars, lcs_ok)


def _tables_from_arrays(word_chars, word_chars_rev, word_lens, doc_tokens,
                        doc_offsets, doc_count, doc_adj, doc_text_len,
                        overflow, max_wlen) -> "CoverageTables":
    """Bucket-pad the word and doc axes before upload: table sizes must
    not be compiled-program shapes, or every incremental finalize would
    invalidate every compiled coverage program (config-5 measured p50
    55s from exactly that). Pad rows are invalid (-1 token codes) and
    are never selected as candidates."""
    n = doc_tokens.shape[0]
    v = word_chars.shape[0]
    n_pad = _pad_bucket(n)
    v_pad = _pad_bucket(v)

    def padded(arr, rows, fill=0):
        if arr.shape[0] == rows:
            return arr
        out = np.full((rows,) + arr.shape[1:], fill, dtype=arr.dtype)
        out[: arr.shape[0]] = arr
        return out

    return CoverageTables(
        word_chars=jnp.asarray(padded(word_chars, v_pad)),
        word_chars_rev=jnp.asarray(padded(word_chars_rev, v_pad)),
        word_lens=jnp.asarray(padded(word_lens, v_pad)),
        doc_tokens=jnp.asarray(padded(doc_tokens, n_pad, fill=-1)),
        doc_tok_offsets=jnp.asarray(padded(doc_offsets, n_pad)),
        doc_tok_count=jnp.asarray(padded(doc_count, n_pad)),
        doc_adj_ws=jnp.asarray(padded(doc_adj, n_pad)),
        doc_text_len=jnp.asarray(padded(doc_text_len, n_pad)),
        overflow=padded(overflow, n_pad),
        tok_count_host=padded(doc_count, n_pad),
        max_wlen_host=padded(max_wlen, n_pad),
        n_docs=n,
        n_words=v,
    )


@dataclass
class CoverageTables:
    """Device-resident doc token tables (+ overflow flags for host fallback)."""

    word_chars: jax.Array
    word_chars_rev: jax.Array
    word_lens: jax.Array
    doc_tokens: jax.Array
    doc_tok_offsets: jax.Array
    doc_tok_count: jax.Array
    doc_adj_ws: jax.Array
    doc_text_len: jax.Array
    overflow: np.ndarray  # bool [N]: doc exceeds D_MAX/L_MAX -> host path
    tok_count_host: np.ndarray = None  # int32 [N] host copy for D routing
    max_wlen_host: np.ndarray = None   # int32 [N] longest word, for L routing
    # Full normalized-lowercase text chars (utf-16 code units) for the
    # in-kernel fake-LCS (StringMetrics.cs:12-36): containment-or-common-
    # prefix needs the whole text INCLUDING delimiters, which the token
    # tables drop. T axis is bucketed (T_LCS_BUCKETS); docs longer than
    # the bucket (or containing surrogate pairs, where code units !=
    # Python chars) get lcs_ok=False and keep the host LCS path.
    text_chars: jax.Array = None       # uint16 [N, T]
    lcs_ok: jax.Array = None           # bool [N]
    lcs_ok_host: np.ndarray = None     # bool [N] host copy (resolve gating)
    # logical (unpadded) doc/word counts — the append path writes new
    # rows at these positions (device dynamic_update_slice)
    n_docs: int = -1
    n_words: int = -1

    @staticmethod
    def build(doc_texts, delimiters) -> "CoverageTables":
        """Encode normalized lowercase doc texts into token tables."""
        arrays = _encode_doc_arrays(doc_texts, delimiters)
        (word_chars, word_chars_rev, word_lens, doc_tokens, doc_offsets,
         doc_count, doc_adj, doc_text_len, overflow, max_wlen) = arrays
        t = _tables_from_arrays(
            word_chars, word_chars_rev, word_lens, doc_tokens,
            doc_offsets, doc_count, doc_adj, doc_text_len, overflow,
            max_wlen)
        _attach_text_lcs(t, doc_texts)
        return t

    def append_texts(self, doc_texts, delimiters, start_id: int) -> bool:
        """Append ``doc_texts`` as docs ``start_id..`` by updating rows
        in place (device ``dynamic_update_slice`` + host mirrors) —
        O(delta) instead of re-encoding the corpus at every incremental
        finalize. New words get fresh codes past ``n_words``; duplicate
        words across base/delta get duplicate rows, which is harmless
        (the kernels compare characters via gathers, never code
        identity). Returns False when an axis bucket would overflow or
        a new text needs a larger LCS bucket — caller falls back to the
        full rebuild (which re-buckets)."""
        k = len(doc_texts)
        if k == 0:
            return True
        if self.n_docs < 0 or self.n_words < 0 or start_id != self.n_docs:
            return False
        if self.text_chars is None or self.lcs_ok_host is None:
            return False
        arrays = _encode_doc_arrays(doc_texts, delimiters)
        (word_chars, word_chars_rev, word_lens, doc_tokens, doc_offsets,
         doc_count, doc_adj, doc_text_len, overflow, max_wlen) = arrays
        w_new = int(word_chars.shape[0])
        if not word_lens.any():
            w_new = 0  # no real words (the encoder pads an empty vocab row)
        n_pad = int(self.overflow.shape[0])
        v_pad = int(self.word_lens.shape[0])
        # local word codes -> global (past the current vocabulary)
        doc_tokens = np.where(doc_tokens >= 0,
                              doc_tokens + np.int32(self.n_words),
                              np.int32(-1))
        # text-LCS rows for the new docs
        t_cap = int(self.text_chars.shape[1])
        encs = [t.encode("utf-16-le") for t in doc_texts]
        if any(t_cap < (len(b) >> 1) <= T_LCS_BUCKETS[-1] for b in encs):
            return False  # full rebuild picks a bigger text bucket
        tc_rows = np.zeros((k, t_cap), np.uint16)
        lok_rows = np.zeros(k, bool)
        for i, b in enumerate(encs):
            m = len(b) >> 1
            if 0 < m <= t_cap:
                tc_rows[i, :m] = np.frombuffer(b, "<u2")
                lok_rows[i] = True
        lok_rows &= ~((tc_rows >= 0xD800) & (tc_rows < 0xE000)).any(axis=1)

        k_pad = _append_bucket(k)
        w_pad = _append_bucket(w_new) if w_new else 0
        if start_id + k_pad > n_pad or self.n_words + w_pad > v_pad:
            return False

        def pad_rows(a, rows, fill=0):
            out = np.full((rows,) + a.shape[1:], fill, dtype=a.dtype)
            out[: a.shape[0]] = a
            return out

        wc_u = pad_rows(word_chars, w_pad) if w_pad else np.zeros(
            (0, word_chars.shape[1]), word_chars.dtype)
        wcr_u = pad_rows(word_chars_rev, w_pad) if w_pad else wc_u
        wl_u = (pad_rows(word_lens, w_pad) if w_pad
                else np.zeros(0, word_lens.dtype))
        updated = _append_update(
            self.word_chars, self.word_chars_rev, self.word_lens,
            self.doc_tokens, self.doc_tok_offsets, self.doc_tok_count,
            self.doc_adj_ws, self.doc_text_len, self.text_chars,
            self.lcs_ok,
            wc_u, wcr_u, wl_u,
            pad_rows(doc_tokens, k_pad, fill=-1),
            pad_rows(doc_offsets, k_pad), pad_rows(doc_count, k_pad),
            pad_rows(doc_adj, k_pad), pad_rows(doc_text_len, k_pad),
            pad_rows(tc_rows, k_pad), pad_rows(lok_rows, k_pad),
            np.int32(self.n_words), np.int32(start_id))
        (self.word_chars, self.word_chars_rev, self.word_lens,
         self.doc_tokens, self.doc_tok_offsets, self.doc_tok_count,
         self.doc_adj_ws, self.doc_text_len, self.text_chars,
         self.lcs_ok) = updated
        # host mirrors (exact rows, not the padded update)
        self.overflow[start_id:start_id + k] = overflow
        self.tok_count_host[start_id:start_id + k] = doc_count
        self.max_wlen_host[start_id:start_id + k] = max_wlen
        self.lcs_ok_host[start_id:start_id + k] = lok_rows
        self.n_docs = start_id + k
        self.n_words += w_new
        return True


def _encode_doc_arrays(doc_texts, delimiters):
    """Raw (unpadded) token-table arrays for ``doc_texts`` — the shared
    encoder behind full builds and incremental appends. Native C++ pass
    when available, Python fallback otherwise (identical outputs, pinned
    by tests/test_coverage_kernel.py)."""
    try:
        from ..native.bulk import build_coverage_arrays

        arrays = build_coverage_arrays(list(doc_texts), delimiters,
                                       D_MAX, L_MAX)
    except Exception:
        arrays = None
    if arrays is not None:
        return arrays
    delims = set(delimiters)
    word_to_code = {}
    words = []
    n = len(doc_texts)
    doc_tokens = np.full((n, D_MAX), -1, dtype=np.int32)
    doc_offsets = np.zeros((n, D_MAX), dtype=np.int32)
    doc_count = np.zeros(n, dtype=np.int32)
    doc_adj = np.zeros((n, D_MAX), dtype=bool)
    doc_text_len = np.zeros(n, dtype=np.int32)
    overflow = np.zeros(n, dtype=bool)
    max_wlen = np.zeros(n, dtype=np.int32)

    for doc_id, text in enumerate(doc_texts):
        doc_text_len[doc_id] = len(text)
        toks = []  # (word, offset)
        i, ln = 0, len(text)
        while i < ln:
            while i < ln and text[i] in delims:
                i += 1
            start = i
            while i < ln and text[i] not in delims:
                i += 1
            if i > start:
                toks.append((text[start:i], start))
        if len(toks) > D_MAX:
            overflow[doc_id] = True
            toks = toks[:D_MAX]
        doc_count[doc_id] = len(toks)
        for j, (w, off) in enumerate(toks):
            if len(w) > L_MAX:
                overflow[doc_id] = True
                w = w[:L_MAX]
            if len(w) > max_wlen[doc_id]:
                max_wlen[doc_id] = len(w)
            code = word_to_code.get(w)
            if code is None:
                code = len(words)
                word_to_code[w] = code
                words.append(w)
            doc_tokens[doc_id, j] = code
            doc_offsets[doc_id, j] = off
            if j + 1 < len(toks):
                gap = text[off + len(w): toks[j + 1][1]]
                doc_adj[doc_id, j] = all(c.isspace() for c in gap)

    w_count = max(len(words), 1)
    word_chars = np.zeros((w_count, L_MAX), dtype=np.int32)
    word_chars_rev = np.zeros((w_count, L_MAX), dtype=np.int32)
    word_lens = np.zeros(w_count, dtype=np.int32)
    for code, w in enumerate(words):
        word_lens[code] = len(w)
        for k, ch in enumerate(w):
            word_chars[code, k] = ord(ch)
            word_chars_rev[code, len(w) - 1 - k] = ord(ch)

    return (word_chars, word_chars_rev, word_lens, doc_tokens, doc_offsets,
            doc_count, doc_adj, doc_text_len, overflow, max_wlen)


def _attach_text_lcs(tables: "CoverageTables", doc_texts) -> None:
    """Build + upload the [N, T] utf-16 text table for the device
    fake-LCS. N is padded to the same bucket as the token tables (shape
    stability across incremental finalizes); T is the smallest
    T_LCS_BUCKETS entry covering the corpus' longest eligible text."""
    n_pad = int(tables.doc_tok_count.shape[0])
    texts = list(doc_texts)
    encs = [t.encode("utf-16-le") for t in texts]
    lens = np.fromiter((len(b) >> 1 for b in encs), np.int64,
                       len(encs)) if encs else np.zeros(0, np.int64)
    t_cap = T_LCS_BUCKETS[0]
    if lens.size:
        longest = int(lens[lens <= T_LCS_BUCKETS[-1]].max(initial=0))
        for b in T_LCS_BUCKETS:
            if b >= longest:
                t_cap = b
                break
    chars = np.zeros((n_pad, t_cap), np.uint16)
    ok = np.zeros(n_pad, bool)
    for i, b in enumerate(encs):
        m = len(b) >> 1
        if 0 < m <= t_cap:
            chars[i, :m] = np.frombuffer(b, "<u2")
            ok[i] = True
    # Surrogate pairs: utf-16 code units no longer align with Python
    # chars, so host and device LCS would disagree — host path for those.
    ok &= ~((chars >= 0xD800) & (chars < 0xE000)).any(axis=1)
    tables.text_chars = jnp.asarray(chars)
    tables.lcs_ok = jnp.asarray(ok)
    tables.lcs_ok_host = ok


def encode_query_lcs(query_lower: str, cap: int = QT_LCS):
    """(chars uint16 [cap], len, ok) for the device fake-LCS.

    ok=False (query too long / contains surrogate pairs) keeps the whole
    query on the host LCS path."""
    b = np.frombuffer(query_lower.encode("utf-16-le"), "<u2")
    ok = bool(b.size and b.size <= cap
              and not ((b >= 0xD800) & (b < 0xE000)).any())
    arr = np.zeros(cap, np.uint16)
    if ok:
        arr[: b.size] = b
    return arr, np.int32(b.size if ok else 0), ok


def encode_query_tokens(tokens, max_tokens: int):
    """(chars [max,L], rev_chars [max,L], lens, offsets, count, overflow)."""
    chars = np.zeros((max_tokens, L_MAX), dtype=np.int32)
    rev = np.zeros((max_tokens, L_MAX), dtype=np.int32)
    lens = np.zeros(max_tokens, dtype=np.int32)
    offsets = np.zeros(max_tokens, dtype=np.int32)
    overflow = len(tokens) > max_tokens
    for i, t in enumerate(tokens[:max_tokens]):
        text = t.lower
        if len(text) > L_MAX:
            overflow = True
            text = text[:L_MAX]
        lens[i] = len(text)
        offsets[i] = t.position
        for k, ch in enumerate(text):
            chars[i, k] = ord(ch)
            rev[i, len(text) - 1 - k] = ord(ch)
    return chars, rev, lens, offsets, min(len(tokens), max_tokens), overflow




# ======================================================================
# Pairwise primitives: [S, D, C] relations between query and doc tokens.
#
# LAYOUT: the candidate axis C is MINOR (the VPU lane axis) in every
# tensor — [S, D, C] masks, [L, D, C] doc chars, [Q, L, C] query chars.
# C is a multiple of 128 so tiles are fully utilized; with C major the
# minor (Q, D) dims covered ~6% of each (8, 128) tile and the kernel ran
# ~15x under the HBM roofline. All matcher loops are statically unrolled
# Python loops (bodies mask inactive iterations), so XLA fuses across
# iterations instead of dispatching each fori_loop trip separately.


def _pairwise_primitives(q_chars, q_lens, q_rev, chars_t, chars_rev_t,
                         lens, valid):
    """EQ / D startswith Q / D endswith Q / Q endswith D / D contains Q /
    common-prefix length, in the C-minor layout.

    q_chars/q_rev [S,L] or [S,L,C]; chars_t/chars_rev_t [L,D,C];
    lens/valid [D,C]. All outputs [S,D,C] and masked by `valid`. Suffix
    relations are prefix relations of the reversed strings (no gathers).
    """
    L, D, C = chars_t.shape
    q3 = q_chars if q_chars.ndim == 3 else q_chars[..., None]
    qr3 = q_rev if q_rev.ndim == 3 else q_rev[..., None]
    ql2 = q_lens if q_lens.ndim == 2 else q_lens[:, None]
    S = q3.shape[0]
    l4 = jnp.asarray(np.arange(L, dtype=np.int32))[None, :, None, None]

    q_t = q3[:, :, None, :]                            # [S,L,1,1|C]
    qr_t = qr3[:, :, None, :]
    d_t = chars_t[None]                                # [1,L,D,C]
    dr_t = chars_rev_t[None]
    ql = ql2[:, None, :]                               # [S,1,1|C]
    ql4 = ql2[:, None, None, :]                        # [S,1,1,1|C]
    dl = lens[None]                                    # [1,D,C]
    dl4 = lens[None, None]                             # [1,1,D,C]
    v = valid[None]                                    # [1,D,C]

    all_eq = ((q_t == d_t) | (l4 >= ql4)).all(axis=1)          # [S,D,C]
    eq = v & (dl == ql) & all_eq
    d_sw_q = v & (dl >= ql) & all_eq

    rev_pref_q = ((qr_t == dr_t) | (l4 >= ql4)).all(axis=1)
    d_ew_q = v & (dl >= ql) & rev_pref_q
    rev_pref_d = ((qr_t == dr_t) | (l4 >= dl4)).all(axis=1)
    q_ew_d = v & (ql >= dl) & rev_pref_d

    # d contains q: slide q over d via STATIC slices of a zero-padded copy
    # (unrolled — every window is one fused compare+reduce).
    padded = jnp.concatenate(
        [chars_t, jnp.zeros((L, D, C), chars_t.dtype)], axis=0)  # [2L,D,C]

    def cont_step(sw, acc):
        sh = jax.lax.dynamic_slice_in_dim(padded, sw, L, axis=0)[None]
        hit = ((sh == q_t) | (l4 >= ql4)).all(axis=1) & (sw + ql <= dl)
        return acc | hit

    d_cont_q = jax.lax.fori_loop(0, L, cont_step,
                                 jnp.zeros((S, D, C), bool))
    d_cont_q = d_cont_q & v

    both4 = jnp.minimum(ql4, dl4)
    mism = (q_t != d_t) & (l4 < both4)
    any_m = mism.any(axis=1)
    first_m = jnp.argmax(mism, axis=1).astype(jnp.int32)
    common_prefix = jnp.where(any_m, first_m,
                              jnp.broadcast_to(jnp.minimum(ql, dl),
                                               any_m.shape))

    return eq, d_sw_q, d_ew_q, q_ew_d, d_cont_q, common_prefix


def _q_startswith_d_t(q_chars, q_lens, chars_t, lens, valid):
    """q token starts with doc token: [S,D,C] (C-minor layout)."""
    L, D, C = chars_t.shape
    l4 = jnp.asarray(np.arange(L, dtype=np.int32))[None, :, None, None]
    q3 = q_chars if q_chars.ndim == 3 else q_chars[..., None]
    ql2 = q_lens if q_lens.ndim == 2 else q_lens[:, None]
    q_t = q3[:, :, None, :]
    d_t = chars_t[None]
    ql = ql2[:, None, :]
    dl = lens[None]
    dl4 = lens[None, None]
    ch_eq = ((q_t == d_t) | (l4 >= dl4)).all(axis=1)
    return valid[None] & (ql >= dl) & ch_eq


# ======================================================================
# The kernel


@functools.partial(jax.jit, static_argnames=("config",))
def coverage_fusion_batch(
    word_chars, word_chars_rev, word_lens, doc_tokens, doc_tok_offsets,
    doc_tok_count, doc_adj_ws, doc_text_len,
    text_ids,            # int32 [C] internal id whose text is scored
    qsel,                # int32 [C] which query each candidate belongs to
    q_chars, q_chars_rev,        # int32 [B, Q, L]
    q_lens, q_idf, q_word_idf,   # [B, Q]
    q_count,                     # int32 [B]
    q_sorted,                    # int32 [B, Q] length-desc stable order
    fq_chars, fq_chars_rev,      # int32 [B, FQ, L]
    fq_lens,                     # int32 [B, FQ]
    fq_count,                    # int32 [B]
    fq_last_is_alpha,            # bool [B]
    lcs_vals,            # f32 [C] (host LCS; 0 where device-computable)
    base_scores,         # f32 [C]
    query_len,           # int32 [B] (full query string lengths)
    text_chars=None,     # uint16 [N, T] full-text chars (device fake-LCS)
    lcs_ok_dev=None,     # bool [N]
    q_text=None,         # uint16 [B, QT]
    q_text_len=None,     # int32 [B]
    q_lcs_tol=None,      # int32 [B] per-query error tolerance
    q_lcs_ok=None,       # bool [B]
    *,
    config: CoverageConfig,
):
    C = text_ids.shape[0]
    Q = q_chars.shape[1]
    FQ = fq_chars.shape[1]
    L = q_chars.shape[2]
    D = config.d_cap if config.d_cap else doc_tokens.shape[1]
    f32 = jnp.float32

    # Per-candidate query views, C-minor: gather along the minor axis of
    # the transposed [.., B] tables (multi-query batches: candidates of
    # many queries score in ONE kernel call).
    qc3 = jnp.transpose(q_chars, (1, 2, 0))[:, :, qsel]        # [Q,L,C]
    qr3 = jnp.transpose(q_chars_rev, (1, 2, 0))[:, :, qsel]
    qlens2 = q_lens.T[:, qsel]                                 # [Q,C]
    qidf2 = q_idf.T[:, qsel]
    qwidf2 = q_word_idf.T[:, qsel]
    qcount = q_count[qsel]                                     # [C]
    qsorted2 = q_sorted.T[:, qsel]                             # [Q,C]
    fqc3 = jnp.transpose(fq_chars, (1, 2, 0))[:, :, qsel]      # [FQ,L,C]
    fqr3 = jnp.transpose(fq_chars_rev, (1, 2, 0))[:, :, qsel]
    fqlens2 = fq_lens.T[:, qsel]                               # [FQ,C]
    fqcount = fq_count[qsel]                                   # [C]
    fq_alpha = fq_last_is_alpha[qsel]
    qlen_c = query_len[qsel]                                   # [C]

    # ---------------- gather doc data ---------------------------------
    # The [:, :D] slices fuse into the gathers; with d_cap set the whole
    # kernel runs at the narrow width (callers route short docs here).
    codes = doc_tokens[text_ids][:, :D].T           # [D,C]
    tok_count = doc_tok_count[text_ids]             # [C]
    offsets = doc_tok_offsets[text_ids][:, :D].T    # [D,C]
    adj_ws = doc_adj_ws[text_ids][:, :D].T          # [D,C]
    text_len = doc_text_len[text_ids]               # [C]
    safe_codes = jnp.maximum(codes, 0)
    # The char axis runs at the QUERY arrays' width L (callers route only
    # docs whose words fit — small bucket = L_CAP_SMALL); the [:, :L]
    # slice fuses into the table gather.
    chars_t = jnp.transpose(word_chars[safe_codes][:, :, :L], (2, 0, 1))
    chars_rev_t = jnp.transpose(
        word_chars_rev[safe_codes][:, :, :L], (2, 0, 1))            # [L,D,C]
    lens = jnp.where(codes >= 0, word_lens[safe_codes], 0)          # [D,C]

    d_iota = jnp.asarray(np.arange(D, dtype=np.int32))
    all_valid = (codes >= 0) & (d_iota[:, None] < tok_count[None])  # [D,C]
    chars_t = jnp.where(all_valid[None], chars_t, 0)
    chars_rev_t = jnp.where(all_valid[None], chars_rev_t, 0)
    lens = jnp.where(all_valid, lens, 0)
    first_char = chars_t[0]                          # [D,C]

    cov = all_valid & (lens >= config.min_word_size)
    same = codes[:, None, :] == codes[None, :, :]            # [D,D',C]
    earlier = (d_iota[None, :] < d_iota[:, None])[:, :, None]
    dup = (same & earlier & cov[None]).any(axis=1) & cov
    unique = cov & ~dup
    u_rank = jnp.cumsum(unique.astype(jnp.int32), axis=0) - 1
    u_count = unique.sum(axis=0)                     # [C]
    cov_count = cov.sum(axis=0)

    q_iota = jnp.asarray(np.arange(Q, dtype=np.int32))
    q_valid = q_iota[:, None] < qcount[None]         # [Q,C]

    # ---------------- precomputed pairwise primitives -------------------
    (EQ, D_SW_Q, D_EW_Q, Q_EW_D, D_CONT_Q, _cp) = _pairwise_primitives(
        qc3, qlens2, qr3, chars_t, chars_rev_t, lens, all_valid)
    _Q_SW_D = _q_startswith_d_t(qc3, qlens2, chars_t, lens, all_valid)

    # Edit distances: TWO banded sweeps serve all five Damerau variants.
    # Sweep A (budget 3) gives exact min(lev, 4): clamped to 3 it is the
    # md=1 internal value, as-is the md=2 one. Alignment/rescue tensors are
    # computed once and shared by every rescue application.
    eq_al, eq_qd1, eq_q1d, rev_eq = alignment_tensors(
        qc3, chars_t, qr3, chars_rev_t)
    lev3 = batched_lev_multi(qc3, qlens2, chars_t, lens, budget=3, l_max=L)
    dam1 = damerau_rescue(jnp.minimum(lev3, 3), eq_al, eq_qd1, eq_q1d,
                          qlens2, lens, max_distance=1)
    dam2 = damerau_rescue(lev3, eq_al, eq_qd1, eq_q1d, qlens2, lens,
                          max_distance=2, rev_eq=rev_eq)
    # Sweep B: the three prefix-window variants stacked along the D axis.
    ql_b = qlens2[:, None, :]                                   # [Q,1,C]
    dl1 = jnp.minimum(lens[None], ql_b)                         # [Q,D,C]
    dl2 = jnp.minimum(lens[None], ql_b + 1)
    dl3 = jnp.minimum(lens[None], jnp.maximum(ql_b - 1, 0))
    chars3 = jnp.concatenate([chars_t, chars_t, chars_t], axis=1)  # [L,3D,C]
    dl_stack = jnp.concatenate([dl1, dl2, dl3], axis=1)         # [Q,3D,C]
    lev_p = batched_lev_multi(qc3, qlens2, chars3, dl_stack,
                              budget=2, l_max=L)
    pdam1 = damerau_rescue(lev_p[:, :D], eq_al, eq_qd1, eq_q1d,
                           qlens2, dl1, max_distance=1)
    pdam2 = damerau_rescue(lev_p[:, D:2 * D], eq_al, eq_qd1, eq_q1d,
                           qlens2, dl2, max_distance=1)
    pdam3 = damerau_rescue(lev_p[:, 2 * D:], eq_al, eq_qd1, eq_q1d,
                           qlens2, dl3, max_distance=1)

    # Per-candidate selections along the small (D or Q) axis are one-hot
    # masked reductions, NEVER take_along_axis: XLA lowers dynamic gathers
    # to serialized scalar-core code (~5-8ms each at C=32k on TPU), while
    # the equivalent masked reduce is one fused vector pass.
    def first_true(mask):
        """mask [D,C] -> (any [C], first index [C])."""
        return mask.any(axis=0), jnp.argmax(mask, axis=0).astype(jnp.int32)

    def at(arr, j):
        """arr [D,C] at per-candidate index j [C] -> [C]."""
        mask = d_iota[:, None] == j[None, :]
        if arr.dtype == jnp.bool_:
            return (arr & mask).any(axis=0)
        return jnp.where(mask, arr, 0).sum(axis=0).astype(arr.dtype)

    def at_q(arr, qi):
        """arr [Q,C] at per-candidate index qi [C] -> [C]."""
        mask = q_iota[:, None] == qi[None, :]
        if arr.dtype == jnp.bool_:
            return (arr & mask).any(axis=0)
        return jnp.where(mask, arr, 0).sum(axis=0).astype(arr.dtype)

    def set_at_false(arr, j, cond):
        mask = (d_iota[:, None] == j[None, :]) & cond[None, :]
        return arr & ~mask

    # ---------------- matcher state ------------------------------------
    q_active = q_valid                               # [Q,C]
    d_active = unique                                # [D,C]
    term_matched = jnp.zeros((Q, C), f32)
    term_has_whole = jnp.zeros((Q, C), bool)
    term_has_joined = jnp.zeros((Q, C), bool)
    term_has_prefix = jnp.zeros((Q, C), bool)
    term_first_pos = jnp.full((Q, C), -1, jnp.int32)
    word_hits = jnp.zeros((C,), jnp.int32)
    num_whole = jnp.zeros((C,), f32)
    num_joined = jnp.zeros((C,), f32)
    num_fuzzy = jnp.zeros((C,), f32)
    num_ps = jnp.zeros((C,), f32)
    penalty = jnp.zeros((C,), jnp.int32)

    def upd_q(arr, i, delta, cond):
        """arr[i, :] += delta where cond (static i)."""
        return arr.at[i].add(jnp.where(cond, delta, 0))

    def set_q_true(arr, i, cond):
        return arr.at[i].set(arr[i] | cond)

    def note_pos(first_pos, i, pos, cond):
        cur = first_pos[i]
        new = jnp.where((cur == -1) | (pos < cur), pos, cur)
        return first_pos.at[i].set(jnp.where(cond, new, cur))

    # ---------------- 1. whole word matcher ----------------------------
    # Every matcher loop below runs as a lax.fori_loop, NOT a Python
    # unroll: iterations are sequential either way (single-consumption
    # state), but unrolling Q=16 / D-1=63 bodies blew the program up to
    # ~10k StableHLO lines and minutes-per-shape remote compiles; rolled
    # loops keep the traced graph ~5x smaller at the same device cost
    # (the kernel is link-latency-bound, not compute-bound).
    if config.cover_whole_words:
        p_increment = jnp.where(qcount > 1, 1.0, 0.0)      # [C]

        def whole_body(i, st):
            (term_matched, term_has_whole, term_has_prefix, term_first_pos,
             word_hits, num_whole, penalty, q_active, d_active) = st
            ql = qlens2[i]                                 # [C]
            eq_i = EQ[i]
            eqm = eq_i & d_active
            any_m, j = first_true(eqm)
            m = any_m & q_active[i] & (i < qcount)

            word_hits = word_hits + m
            num_whole = num_whole + jnp.where(m, ql.astype(f32), 0.0)
            num_whole = num_whole + jnp.where(
                m & (i < qcount - 1), p_increment, 0.0)
            term_matched = upd_q(term_matched, i, ql.astype(f32), m)
            term_has_whole = set_q_true(term_has_whole, i, m)
            term_has_prefix = set_q_true(term_has_prefix, i, m)
            term_first_pos = note_pos(term_first_pos, i, at(offsets, j), m)

            sel = unique & (u_rank == i)
            tok_i_eq = (sel & eq_i).any(axis=0)
            exists = i < u_count
            penalty = penalty + jnp.where(m & ~(exists & tok_i_eq), 1, 0)

            q_active = q_active.at[i].set(q_active[i] & ~m)
            d_active = set_at_false(d_active, j, m)
            return (term_matched, term_has_whole, term_has_prefix,
                    term_first_pos, word_hits, num_whole, penalty,
                    q_active, d_active)

        (term_matched, term_has_whole, term_has_prefix, term_first_pos,
         word_hits, num_whole, penalty, q_active, d_active) = \
            jax.lax.fori_loop(0, Q, whole_body,
                              (term_matched, term_has_whole,
                               term_has_prefix, term_first_pos, word_hits,
                               num_whole, penalty, q_active, d_active))

    # ---------------- 2. joined word matcher ---------------------------
    if config.cover_joined_words:
        def qjoin_body(i, st):
            (term_matched, term_has_joined, term_has_prefix,
             term_first_pos, word_hits, num_joined, q_active,
             d_active) = st
            cond_q = q_active[i] & q_active[i + 1] & (i + 1 < qcount)
            jl = qlens2[i] + qlens2[i + 1]                 # [C]
            dmask = d_active & (lens == jl[None, :]) & D_SW_Q[i] & \
                D_EW_Q[i + 1]
            any_m, j = first_true(dmask)
            m = any_m & cond_q
            num_joined = num_joined + jnp.where(m, jl.astype(f32), 0.0)
            word_hits = word_hits + 2 * m
            pos = at(offsets, j)
            term_matched = upd_q(term_matched, i, qlens2[i].astype(f32), m)
            term_has_joined = set_q_true(term_has_joined, i, m)
            term_has_prefix = set_q_true(term_has_prefix, i, m)
            term_first_pos = note_pos(term_first_pos, i, pos, m)
            term_matched = upd_q(term_matched, i + 1,
                                 qlens2[i + 1].astype(f32), m)
            term_has_joined = set_q_true(term_has_joined, i + 1, m)
            term_first_pos = note_pos(term_first_pos, i + 1, pos, m)
            q_active = q_active.at[i].set(q_active[i] & ~m)
            q_active = q_active.at[i + 1].set(q_active[i + 1] & ~m)
            d_active = set_at_false(d_active, j, m)
            return (term_matched, term_has_joined, term_has_prefix,
                    term_first_pos, word_hits, num_joined, q_active,
                    d_active)

        (term_matched, term_has_joined, term_has_prefix, term_first_pos,
         word_hits, num_joined, q_active, d_active) = jax.lax.fori_loop(
            0, Q - 1, qjoin_body,
            (term_matched, term_has_joined, term_has_prefix,
             term_first_pos, word_hits, num_joined, q_active, d_active))

        # doc-joined: adjacent ACTIVE doc pair == one query token
        def djoin_body(i, st):
            (term_matched, term_has_joined, term_has_prefix,
             term_first_pos, word_hits, num_joined, q_active,
             d_active) = st
            di_active = d_active[i]
            later = d_active & (d_iota[:, None] > i)
            has_nxt, nxt = first_true(later)
            cond = di_active & has_nxt

            len_i = lens[i]
            len_n = at(lens, nxt)
            jl = len_i + len_n
            # q startswith d_i / q endswith d_nxt (one-hot D):
            q_sw_di = jax.lax.dynamic_index_in_dim(
                _Q_SW_D, i, axis=1, keepdims=False)             # [Q,C]
            q_ew_dn = (Q_EW_D &
                       (d_iota[:, None] == nxt[None, :])[None]).any(axis=1)
            qmask = q_active & (qlens2 == jl[None, :]) & q_sw_di & q_ew_dn
            any_q = qmask.any(axis=0)
            qi = jnp.argmax(qmask, axis=0).astype(jnp.int32)
            m = cond & any_q

            num_joined = num_joined + jnp.where(m, jl.astype(f32), 0.0)
            word_hits = word_hits + m
            upd = m[None, :] & (q_iota[:, None] == qi[None, :])
            term_matched = term_matched + \
                jnp.where(upd, jl[None, :].astype(f32), 0.0)
            term_has_joined = term_has_joined | upd
            term_has_prefix = term_has_prefix | upd
            pos_i = offsets[i]
            cur = at_q(term_first_pos, qi)
            new = jnp.where((cur == -1) | (pos_i < cur), pos_i, cur)
            term_first_pos = jnp.where(
                upd, jnp.where(m, new, cur)[None, :], term_first_pos)
            q_active = q_active & ~upd
            d_active = d_active.at[i].set(d_active[i] & ~m)
            d_active = set_at_false(d_active, nxt, m)
            return (term_matched, term_has_joined, term_has_prefix,
                    term_first_pos, word_hits, num_joined, q_active,
                    d_active)

        (term_matched, term_has_joined, term_has_prefix, term_first_pos,
         word_hits, num_joined, q_active, d_active) = jax.lax.fori_loop(
            0, D - 1, djoin_body,
            (term_matched, term_has_joined, term_has_prefix,
             term_first_pos, word_hits, num_joined, q_active, d_active))

    # ---------------- 3. prefix/suffix matcher -------------------------
    if config.cover_prefix_suffix:
        d_start_active = d_active
        d_key = jnp.where(d_start_active, -lens, jnp.int32(10**6)) * D + \
            d_iota[:, None]

        def first_in_order(flags, d_key):
            """First flagged doc token in (length desc, index asc) order ==
            argmin of the masked sort key (no argsort, no permutation)."""
            masked = jnp.where(flags, d_key, jnp.int32(2**30))
            j = jnp.argmin(masked, axis=0).astype(jnp.int32)
            return flags.any(axis=0), j

        def take_q(arr_sdc, qi):
            """arr [S,D,C] at per-candidate token index qi [C] -> [D,C]."""
            mask = (q_iota[:, None] == qi[None, :])[:, None, :]  # [S,1,C]
            if arr_sdc.dtype == jnp.bool_:
                return (arr_sdc & mask).any(axis=0)
            return jnp.where(mask, arr_sdc, 0).sum(axis=0).astype(
                arr_sdc.dtype)

        def ps_body(si, st):
            (term_matched, term_has_prefix, term_first_pos, word_hits,
             num_ps, q_active, d_active) = st
            qi = qsorted2[si]                              # [C]
            ql = at_q(qlens2, qi)                          # [C]
            qlc = ql[None, :]                              # [1,C]
            qa = at_q(q_active, qi) & (qi < qcount)

            shorter = qlc < lens
            longer = qlc > lens
            pre = shorter & take_q(D_SW_Q, qi)
            suf = shorter & ~pre & take_q(D_EW_Q, qi)
            cont = shorter & ~pre & ~suf & (qlc >= 4) & take_q(D_CONT_Q, qi)
            dq = longer & take_q(Q_EW_D, qi)
            is_match = (pre | suf | cont | dq) & d_active
            score = jnp.where(
                pre, jnp.broadcast_to(qlc.astype(f32), lens.shape),
                jnp.where(suf, jnp.broadcast_to(
                    jnp.maximum(1, qlc // 2).astype(f32), lens.shape),
                          jnp.where(cont, jnp.broadcast_to(
                              qlc.astype(f32) * 0.6, lens.shape),
                                    lens.astype(f32))))
            any_m, j = first_in_order(is_match, d_key)
            m = any_m & qa
            sc = at(jnp.where(is_match, score, 0.0), j)
            is_pre = at(pre, j)
            num_ps = num_ps + jnp.where(m, sc, 0.0)
            word_hits = word_hits + m
            upd = m[None, :] & (q_iota[:, None] == qi[None, :])
            term_matched = term_matched + jnp.where(upd, sc[None, :], 0.0)
            term_has_prefix = term_has_prefix | (upd & is_pre[None, :])
            pos = at(offsets, j)
            cur = at_q(term_first_pos, qi)
            new = jnp.where((cur == -1) | (pos < cur), pos, cur)
            term_first_pos = jnp.where(
                upd, jnp.where(m, new, cur)[None, :], term_first_pos)
            q_active = q_active & ~upd
            d_active = set_at_false(d_active, j, m)
            return (term_matched, term_has_prefix, term_first_pos,
                    word_hits, num_ps, q_active, d_active)

        (term_matched, term_has_prefix, term_first_pos, word_hits,
         num_ps, q_active, d_active) = jax.lax.fori_loop(
            0, Q, ps_body,
            (term_matched, term_has_prefix, term_first_pos, word_hits,
             num_ps, q_active, d_active))

        def psfz_body(si, st):
            (term_matched, term_first_pos, word_hits, num_ps, q_active,
             d_active) = st
            qi = qsorted2[si]
            ql = at_q(qlens2, qi)
            qlc = ql[None, :]
            qa = at_q(q_active, qi) & (qi < qcount)
            eligible_q = (ql >= 4) | ((qi == qcount - 1) & (ql >= 2))
            d_elig = d_active & (qlc < lens)

            d1 = take_q(pdam1, qi)
            d2 = take_q(pdam2, qi)
            d3 = take_q(pdam3, qi)
            m1 = d1 <= 1
            m2 = ~m1 & (lens > qlc) & (d2 <= 1)
            m3 = ~m1 & ~m2 & (lens > qlc) & (qlc > 1) & (d3 <= 1)
            score = jnp.where(
                m1, jnp.maximum((qlc - d1).astype(f32), 0.1),
                jnp.where(m2, jnp.maximum((qlc - d2).astype(f32), 0.1),
                          jnp.maximum((qlc - 1 - d3).astype(f32), 0.1)))
            is_match = (m1 | m2 | m3) & d_elig
            any_m, j = first_in_order(is_match, d_key)
            m = any_m & qa & eligible_q
            sc = at(jnp.where(is_match, score, 0.0), j)
            num_ps = num_ps + jnp.where(m, sc, 0.0)
            word_hits = word_hits + m
            upd = m[None, :] & (q_iota[:, None] == qi[None, :])
            term_matched = term_matched + jnp.where(upd, sc[None, :], 0.0)
            pos = at(offsets, j)
            cur = at_q(term_first_pos, qi)
            new = jnp.where((cur == -1) | (pos < cur), pos, cur)
            term_first_pos = jnp.where(
                upd, jnp.where(m, new, cur)[None, :], term_first_pos)
            q_active = q_active & ~upd
            d_active = set_at_false(d_active, j, m)
            return (term_matched, term_first_pos, word_hits, num_ps,
                    q_active, d_active)

        (term_matched, term_first_pos, word_hits, num_ps, q_active,
         d_active) = jax.lax.fori_loop(
            0, Q, psfz_body,
            (term_matched, term_first_pos, word_hits, num_ps, q_active,
             d_active))

    # ---------------- 4. fuzzy word matcher ----------------------------
    if config.cover_fuzzy_words:
        fully = (qlens2 <= 0) | \
            (term_matched >= qlens2.astype(f32)) | ~q_valid
        all_full = fully.all(axis=0)

        max_q_len = jnp.max(
            jnp.where(q_active & q_valid, qlens2, 0), axis=0)
        max_edit = jnp.where(
            max_q_len >= config.min_length_two_typos, 2,
            jnp.where(max_q_len >= config.min_length_one_typo, 1, 0))
        special_global = (max_q_len == 2) & (max_edit == 0) & \
            (config.num_typos >= 1)
        max_edit = jnp.where(special_global, 1, max_edit)
        max_edit = jnp.minimum(max_edit, config.num_typos)

        for edit_dist in (1, 2):
            if edit_dist > config.num_typos:
                break
            round_on = (edit_dist <= max_edit) & ~all_full
            dist_all = dam1 if edit_dist == 1 else dam2

            def fuzzy_body(i, st, edit_dist=edit_dist, round_on=round_on,
                           dist_all=dist_all):
                (term_matched, term_first_pos, word_hits, num_fuzzy,
                 q_active, d_active) = st
                ql = qlens2[i]                             # [C]
                qa = q_active[i] & (i < qcount) & round_on
                if config.min_word_size > 0:
                    qa = qa & (ql >= config.min_word_size)
                token_max = jnp.where(
                    ql >= config.min_length_two_typos, 2,
                    jnp.where(ql >= config.min_length_one_typo, 1, 0))
                special = (ql == 2) & (token_max == 0) & \
                    (config.num_typos >= 1)
                token_max = jnp.where(special, 1, token_max)
                token_max = jnp.minimum(token_max, config.num_typos)
                qa = qa & (edit_dist <= token_max)
                if edit_dist != 1:
                    qa = qa & ~special

                min_len = jnp.maximum(config.min_word_size,
                                      ql - edit_dist)[None, :]
                max_len = jnp.minimum(
                    jnp.minimum(config.levenshtein_max_word_size,
                                ql + edit_dist), 63)[None, :]
                window = (lens >= min_len) & (lens <= max_len)
                first_char_ok = jnp.where(
                    special[None, :],
                    (lens > 0) & (first_char == qc3[i, 0][None, :]),
                    True)
                dist = dist_all[i]
                is_match = d_active & window & first_char_ok & \
                    (dist <= edit_dist)
                any_m, j = first_true(is_match)
                m = any_m & qa
                dd = at(dist, j)
                credit = jnp.where(m, (ql - dd).astype(f32), 0.0)
                word_hits = word_hits + m
                num_fuzzy = num_fuzzy + credit
                term_matched = term_matched.at[i].add(credit)
                term_first_pos = note_pos(term_first_pos, i,
                                          at(offsets, j), m)
                q_active = q_active.at[i].set(q_active[i] & ~m)
                d_active = set_at_false(d_active, j, m)
                return (term_matched, term_first_pos, word_hits,
                        num_fuzzy, q_active, d_active)

            (term_matched, term_first_pos, word_hits, num_fuzzy,
             q_active, d_active) = jax.lax.fori_loop(
                0, Q, fuzzy_body,
                (term_matched, term_first_pos, word_hits, num_fuzzy,
                 q_active, d_active))

    # ================== device fake-LCS ================================
    # StringMetrics.cs:12-36 over the FULL normalized text (host parity:
    # utils/metrics.py lcs()): len(q) when q is contained in r, else
    # min(prefix+tol, min(|q|,|r|)) when they share a prefix, else 0.
    # Host-computed lcs_vals survive where the doc/query is ineligible
    # (text longer than the table, surrogate pairs, long queries).
    if text_chars is not None:
        txt = text_chars[text_ids].T.astype(jnp.int32)          # [T,C]
        qt = q_text.T[:, qsel].astype(jnp.int32)                # [QT,C]
        qtl = q_text_len[qsel]                                  # [C]
        tol_c = q_lcs_tol[qsel]
        T_CAP = txt.shape[0]
        QT = qt.shape[0]
        qt_iota = jnp.asarray(np.arange(QT, dtype=np.int32))[:, None]
        lim = jnp.minimum(qtl, text_len)[None]                  # [1,C]
        mism = (qt != txt[:QT]) & (qt_iota < lim)
        any_m = mism.any(axis=0)
        prefix = jnp.where(any_m, jnp.argmax(mism, axis=0).astype(jnp.int32),
                           jnp.minimum(qtl, text_len))
        # Blocked containment scan: BLK offsets per trip (T/BLK trips of
        # [BLK, QT, C] work instead of T trips of [QT, C]) keeps loop
        # overhead negligible for the small single-query chunk program.
        BLK = 8
        padded_txt = jnp.concatenate(
            [txt, jnp.zeros((QT + BLK, C), txt.dtype)], axis=0)
        blk_iota = jnp.asarray(np.arange(BLK, dtype=np.int32))[:, None]

        def _lcs_cont_step(i, acc):
            o0 = i * BLK
            sh = jax.lax.dynamic_slice_in_dim(padded_txt, o0, QT + BLK,
                                              axis=0)
            win = jnp.stack([jax.lax.dynamic_slice_in_dim(sh, b, QT, axis=0)
                             for b in range(BLK)])          # [BLK,QT,C]
            hit = ((win == qt[None])
                   | (qt_iota[None] >= qtl[None, None])).all(axis=1)
            ok = hit & ((o0 + blk_iota + qtl[None]) <= text_len[None])
            return acc | ok.any(axis=0)

        contained = jax.lax.fori_loop(0, T_CAP // BLK, _lcs_cont_step,
                                      jnp.zeros((C,), bool))
        pfx_val = jnp.minimum(prefix + tol_c, jnp.minimum(qtl, text_len))
        dev_lcs = jnp.where(contained, qtl,
                            jnp.where(prefix > 0, pfx_val, 0))
        dev_lcs = jnp.where((qtl > 0) & (text_len > 0), dev_lcs, 0)
        use_dev = lcs_ok_dev[text_ids] & q_lcs_ok[qsel]
        lcs_vals = jnp.where(use_dev, dev_lcs.astype(f32), lcs_vals)

    # ================== CoverageScorer =================================
    lcs_eff = lcs_vals if config.cover_whole_query else jnp.zeros_like(lcs_vals)
    num11 = num_joined + num_whole + num_fuzzy + num_ps - penalty.astype(f32)
    num11 = jnp.where((num11 == 0.0) & (lcs_eff > 2.0), lcs_eff - 2.0, num11)
    qlen_f = jnp.maximum(qlen_c, 1).astype(f32)                 # [C]

    tmc = qlens2.astype(f32)
    has_term = q_valid & (qlens2 > 0)
    ci = jnp.where(has_term,
                   jnp.minimum(1.0, term_matched / jnp.maximum(tmc, 1.0)), 0.0)
    sum_ci = ci.sum(axis=0)
    terms_with_any = (has_term & (ci > 0)).sum(axis=0)
    total_idf = jnp.where(has_term, qidf2, 0.0).sum(axis=0)
    idf_weighted = (ci * jnp.where(has_term, qidf2, 0.0)).sum(axis=0)
    missing_idf = jnp.where(has_term & (ci < 1.0),
                            (1.0 - ci) * qidf2, 0.0).sum(axis=0)
    last_idx = jnp.maximum(qcount - 1, 0)                       # [C]
    last_idf = at_q(qidf2, last_idx)

    fully_matched = has_term & (term_matched >= (tmc - 0.01))
    terms_fully = fully_matched.sum(axis=0)
    strict = (term_has_whole | term_has_joined) & fully_matched
    terms_strict = strict.sum(axis=0)
    terms_prefix = (term_has_prefix & has_term).sum(axis=0)

    pos_valid = (term_first_pos >= 0) & has_term
    big_pos = jnp.int32(2**30)
    first_match_index = jnp.min(
        jnp.where(pos_valid, term_first_pos, big_pos), axis=0)
    has_any_pos = pos_valid.any(axis=0)
    first_match_index = jnp.where(has_any_pos, first_match_index, -1)
    min_pos = jnp.min(jnp.where(pos_valid, term_first_pos, big_pos), axis=0)
    max_pos = jnp.max(jnp.where(pos_valid, term_first_pos, -1), axis=0)

    idf_coverage = jnp.where(total_idf > 0, idf_weighted / total_idf, 0.0)
    type_ahead = (qcount > 0) & (total_idf > 0) & \
        ((last_idf / jnp.maximum(total_idf, 1e-30)) <=
         1.0 / (qcount + 1).astype(f32))

    single_lcs_ci = jnp.minimum(1.0, lcs_eff / qlen_f)
    sum_ci = jnp.where((qcount == 1) & (qlen_c > 0) & (lcs_eff > 0) &
                       (single_lcs_ci > sum_ci), single_lcs_ci, sum_ci)

    prefix_hit = term_has_prefix & has_term & (term_matched > 0)

    def run_step(i, st):
        run, longest = st
        hit = prefix_hit[i] & (i < qcount)
        run = jnp.where(hit, run + 1, 0)
        return run, jnp.maximum(longest, run)

    _, longest_run = jax.lax.fori_loop(
        0, Q, run_step, (jnp.zeros((C,), jnp.int32),
                         jnp.zeros((C,), jnp.int32)))

    def suf_step(k, st):
        suffix_run, still = st
        i = jnp.clip(qcount - 1 - k, 0, Q - 1)                  # [C]
        hit = at_q(prefix_hit, i)
        in_range = k < qcount
        cont = still & hit & in_range
        return suffix_run + cont, jnp.where(in_range, cont, still)

    suffix_run, _ = jax.lax.fori_loop(
        0, Q, suf_step, (jnp.zeros((C,), jnp.int32),
                         jnp.ones((C,), bool)))

    phrase_span = jnp.where(
        (min_pos != big_pos) & (max_pos >= min_pos) & (terms_with_any >= 2),
        max_pos - min_pos + 1, 0)
    del phrase_span  # computed for parity; unused by fusion

    last_token_has_prefix = at_q(prefix_hit, last_idx) & (qcount >= 1)
    preceding_strict = (strict &
                        (q_iota[:, None] < (qcount - 1)[None, :])).sum(axis=0)
    preceding_strict = jnp.where(qcount >= 2, preceding_strict, 0)

    # ================== FusionSignalComputer ===========================
    sig = _fusion_signals(
        fqc3, fqr3, fqlens2, fqcount, fq_alpha,
        dam2[0], chars_t, chars_rev_t, lens, adj_ws, all_valid,
        tok_count, C, D, L, FQ, config)
    sig["_fq_count"] = fqcount

    # ================== FusionScorer ===================================
    score, tiebreaker = _fusion_score_impl(
        C, Q, f32, q_iota, qcount, qlen_c, text_len,
        terms_with_any, terms_fully, terms_strict, terms_prefix,
        first_match_index, sum_ci, word_hits, cov_count,
        longest_run, suffix_run, preceding_strict, last_token_has_prefix,
        type_ahead, idf_coverage, total_idf, missing_idf,
        qwidf2, ci, has_term, sig, base_scores)

    # ONE packed output array = ONE host transfer per call. On tunneled
    # devices every array readback pays a full round trip, so returning
    # (score, tie, hits) separately would triple the readback latency.
    # Device-LCS builds additionally pack tie/word_hits/lcs (each 0-255)
    # into ONE f32 row (24 bits, exact): [2, C] halves the download vs
    # [4, C] at ~40MB/s tunnel bandwidth. Legacy 3-row layout is kept for
    # the sharded wrapper (no text table).
    if text_chars is not None:
        meta = (tiebreaker.astype(jnp.int32) * 65536
                + jnp.clip(word_hits, 0, 255).astype(jnp.int32) * 256
                + jnp.clip(lcs_vals, 0, 255).astype(jnp.int32))
        return jnp.stack([score, meta.astype(f32)])
    return jnp.stack([score, tiebreaker.astype(f32), word_hits.astype(f32)])


def _fusion_signals(fq_chars, fq_chars_rev, fq_lens, fq_count,
                    fq_last_is_alpha, dam2_q0, chars_t, chars_rev_t,
                    lens, adj_ws, all_valid, tok_count,
                    C, D, L, FQ, config):
    """FusionSignalComputer.ComputeSignals, batched over candidates.

    fq_chars/fq_chars_rev [FQ,L,C]; fq_lens [FQ,C]; fq_count [C];
    fq_last_is_alpha [C]; dam2_q0 [D,C]; doc tensors C-minor.
    """
    f32 = jnp.float32
    fq_iota = jnp.asarray(np.arange(FQ, dtype=np.int32))
    d_iota = jnp.asarray(np.arange(D, dtype=np.int32))
    fq_valid_vec = fq_iota[:, None] < fq_count[None, :]         # [FQ,C]
    have = (fq_count > 0) & (tok_count > 0)

    (F_EQ, F_D_SW_Q, _F_D_EW_Q, _F_Q_EW_D, F_CONT, F_CP) = \
        _pairwise_primitives(fq_chars, fq_lens, fq_chars_rev, chars_t,
                             chars_rev_t, lens, all_valid)
    F_Q_SW_D = _q_startswith_d_t(fq_chars, fq_lens, chars_t, lens, all_valid)

    last_idx = jnp.maximum(fq_count - 1, 0)                     # [C]
    # one-hot selections along the small FQ/D axes (see coverage kernel
    # note: dynamic gathers serialize on the TPU scalar core)
    last_oh2 = fq_iota[:, None] == last_idx[None, :]            # [FQ,C]
    last_oh3 = last_oh2[:, None, :]                             # [FQ,1,C]
    last_len = jnp.where(last_oh2, fq_lens, 0).sum(axis=0)

    # --- 1. CheckPrefixLastMatch ---------------------------------------
    sw0 = F_D_SW_Q[0]                               # [D,C]
    any_sw0 = sw0.any(axis=0)
    j0 = jnp.argmax(sw0, axis=0).astype(jnp.int32)
    exact0 = (F_EQ[0] & (d_iota[:, None] == j0[None, :])).any(axis=0)
    single_lpl = any_sw0
    single_ape = any_sw0 & exact0

    eq_any = F_EQ.any(axis=1)                       # [FQ,C]
    is_prec = fq_iota[:, None] < (fq_count - 1)[None, :]
    all_prec = jnp.where(is_prec, eq_any, True).all(axis=0)
    last_sw = (F_D_SW_Q & last_oh3).any(axis=(0, 1))
    multi_lpl = all_prec & last_sw
    lexical_prefix_last = jnp.where(fq_count == 1, single_lpl, multi_lpl) & have
    all_preceding_exact = jnp.where(
        fq_count == 1, single_ape, multi_lpl) & have

    # --- 2. PerfectDoc -------------------------------------------------
    explained = ((F_D_SW_Q | F_Q_SW_D) & fq_valid_vec[:, None, :]
                 ).any(axis=0)                      # [D,C]
    perfect = jnp.where(all_valid, explained, True).all(axis=0) & have

    # --- 3. StemEvidence (fq_count >= 2) -------------------------------
    min_stem = config.min_word_size
    considered = fq_valid_vec & (fq_lens >= min_stem)
    word_match = (F_EQ | F_D_SW_Q).any(axis=1)      # [FQ,C]
    unmatched = considered & ~word_match
    ev_tok = all_valid[None] & (lens[None] >= min_stem) & \
        (F_Q_SW_D | (F_CP >= min_stem))
    evidence = ev_tok.any(axis=1)                   # [FQ,C]
    unmatched_cnt = unmatched.sum(axis=0)
    evidence_cnt = (unmatched & evidence).sum(axis=0)
    stem_evidence = (fq_count >= 2) & (unmatched_cnt > 0) & \
        (evidence_cnt == unmatched_cnt) & have

    # --- 4. AnchorStem -------------------------------------------------
    first_len = fq_lens[0]                          # [C]
    stem_ok = (fq_count > 0) & (first_len >= ANCHOR_STEM_LENGTH)
    stem_len = jnp.int32(ANCHOR_STEM_LENGTH)
    l3 = jnp.asarray(np.arange(L, dtype=np.int32))[:, None, None]  # [L,1,1]
    ch_eq = (chars_t == fq_chars[0][:, None, :]) | (l3 >= stem_len)
    d_sw_stem = all_valid & (lens >= stem_len) & ch_eq.all(axis=0)  # [D,C]
    first_tok_match = d_sw_stem[0] & (tok_count > 0)
    first_tok_long_enough = (tok_count > 0) & (lens[0] >= stem_len)
    rest_match = (d_sw_stem & (d_iota[:, None] >= 1)).any(axis=0)
    anchor = jnp.where(
        first_tok_long_enough, first_tok_match | rest_match,
        jnp.where(tok_count > 0, False, d_sw_stem.any(axis=0)))
    has_anchor_stem = stem_ok & anchor & have

    # --- 5. TrailingMatchDensity ---------------------------------------
    trail_on = (fq_count >= 2) & (last_len >= 1) & \
        (last_len <= MAX_TRAILING_LEN)
    d_sw_last = (F_D_SW_Q & last_oh3).any(axis=0)               # [D,C]
    cont_last = (F_CONT & last_oh3).any(axis=0)
    matchable = (d_sw_last |
                 ((lens > last_len[None, :]) & cont_last)) & all_valid
    m_count = matchable.sum(axis=0)
    density = m_count.astype(f32) / jnp.maximum(tok_count, 1).astype(f32)
    trailing_density = jnp.where(
        trail_on & (m_count > 0),
        jnp.clip(density * 255.0, 0.0, 255.0).astype(jnp.int32), 0)

    # --- 6. SingleTermLexicalSim ----------------------------------------
    # When fq_count == 1 (the only case this signal is used) the single
    # fusion token equals coverage token 0, so dam2[0] is its Damerau.
    sim = _single_term_lexical_sim(
        fq_chars[0], fq_chars_rev[0], fq_lens[0], dam2_q0,
        chars_t, chars_rev_t, lens, all_valid, C, D, L)
    single_sim = jnp.where(
        (fq_count == 1) & have,
        jnp.clip(sim * 255.0, 0.0, 255.0).astype(jnp.int32), 0)

    # --- 7. SingleCharLastTokenBoost -----------------------------------
    boost = _single_char_last_boost(
        fq_lens, fq_count, fq_last_is_alpha, fq_chars,
        chars_t[0], lens, adj_ws, all_valid, F_CONT, C, D, FQ, d_iota)
    boost = jnp.where((fq_count >= 2) & have, boost, 0)

    return dict(
        lexical_prefix_last=lexical_prefix_last,
        all_preceding_exact=all_preceding_exact,
        is_perfect_doc=perfect,
        has_stem_evidence=stem_evidence,
        has_anchor_stem=has_anchor_stem,
        trailing_density=trailing_density,
        single_sim=single_sim,
        single_char_boost=boost,
    )


def _single_term_lexical_sim(q_chars, q_rev, q_len, dam2_q0,
                             chars_t, chars_rev_t, lens, all_valid, C, D, L):
    """ComputeSingleTermLexicalSimilarity, batched (C-minor layout).

    Per-candidate query: q_chars/q_rev [L,C], q_len [C]; dam2_q0 [D,C].
    """

    f32 = jnp.float32
    qlen_f = jnp.maximum(q_len, 1).astype(f32)[None, :]       # [1,C]
    ok = q_len >= 3                                           # [C]
    tok_ok = all_valid & (lens >= 2)
    l3 = jnp.asarray(np.arange(L, dtype=np.int32))[:, None, None]  # [L,1,1]
    dl3 = lens[None]                                          # [1,D,C]

    # substring + prefix-suffix share ONE slide loop over STATIC window
    # shifts of the zero-padded [2L,C] query rows (no dynamic gathers):
    #  * substring: first shift where the whole doc token matches inside q;
    #  * prefix-suffix (largest k >= 2 with q[-k:] == t[:k]): at shift sw
    #    the alignment compares q[sw+j] vs t[j], so the match with
    #    k = q_len - sw holds iff the leading match run covers k chars.
    q_padded = jnp.concatenate(
        [q_chars, jnp.zeros((L, C), q_chars.dtype)], axis=0)  # [2L,C]

    def slide_step(sw, st):
        found_idx, best_k = st
        q_sh = jax.lax.dynamic_slice_in_dim(
            q_padded, sw, L, axis=0)[:, None, :]              # [L,1,C]
        aligned_eq = q_sh == chars_t                          # [L,D,C]
        hit = (aligned_eq | (l3 >= dl3)).all(axis=0) & \
            (sw + lens <= q_len[None, :])
        found_idx = jnp.where((found_idx < 0) & hit, sw, found_idx)

        mism = ~aligned_eq
        run = jnp.where(mism.any(axis=0),
                        jnp.argmax(mism, axis=0).astype(jnp.int32), L)
        k = q_len[None, :] - sw                               # [1,C]
        ps_match = (k >= 2) & (k <= jnp.minimum(q_len[None, :], lens)) & \
            (run >= k)
        return found_idx, jnp.maximum(best_k, jnp.where(ps_match, k, 0))

    found_idx, best_k = jax.lax.fori_loop(
        0, L, slide_step, (jnp.full((D, C), -1, jnp.int32),
                           jnp.zeros((D, C), jnp.int32)))
    sub_hit = found_idx >= 0
    len_frac = lens.astype(f32) / qlen_f
    pos_factor = 1.0 - found_idx.astype(f32) / qlen_f
    sub_score = jnp.where(sub_hit & tok_ok, len_frac * pos_factor, 0.0)
    ps_score = jnp.where(tok_ok, best_k.astype(f32) / qlen_f, 0.0)

    dist = dam2_q0
    fz_score = jnp.where(tok_ok & (dist <= 2),
                         (q_len[None, :] - dist).astype(f32) / qlen_f, 0.0)

    best = jnp.max(
        jnp.where(sub_hit & tok_ok, sub_score,
                  jnp.maximum(ps_score, fz_score)), axis=0)
    best = jnp.maximum(best, 0.0)

    # two-segment heuristic
    MIN_SEG = 3
    two_ok = q_len >= 2 * MIN_SEG                              # [C]
    seg_len = jnp.minimum(2 * MIN_SEG, q_len // 2)             # [C]
    seg3 = seg_len[None, None, :]                              # [1,1,C]
    tok3 = all_valid & (lens >= 3)
    # prefix frag vs token: one is a prefix of the other
    pre_match = tok3 & (((q_chars[:, None, :] == chars_t) |
                         (l3 >= jnp.minimum(seg3, dl3))).all(axis=0))
    # suffix frag: rev(frag) = q_rev[:seg_len]; t-or-frag suffix relation ==
    # prefix relation of the reversed strings over m = min(seg_len, len_t).
    m3 = jnp.minimum(seg3, dl3)                                # [1,D,C]
    suf_match = tok3 & (((q_rev[:, None, :] == chars_rev_t) |
                         (l3 >= m3)).all(axis=0))

    any_pre = pre_match.any(axis=0)
    pre_i = jnp.argmax(pre_match, axis=0)
    any_suf = suf_match.any(axis=0)
    suf_i = jnp.argmax(suf_match, axis=0)
    two_seg_hit = two_ok & any_pre & any_suf & (pre_i != suf_i)
    two_seg_score = jnp.minimum(
        1.0, (2 * seg_len).astype(f32) / qlen_f[0])
    best = jnp.where(two_seg_hit & (two_seg_score > best), two_seg_score, best)
    return jnp.where(ok, best, 0.0)


def _single_char_last_boost(fq_lens, fq_count, fq_last_is_alpha, fq_chars,
                            first_char, lens, adj_ws, all_valid,
                            F_CONT, C, D, FQ, d_iota):
    """ComputeSingleCharLastTokenMatch, batched sequential walk.

    fq_lens [FQ,C], fq_count [C], fq_chars [FQ,L,C]; doc tensors C-minor.
    """
    fq_iota = jnp.asarray(np.arange(FQ, dtype=np.int32))
    last_idx = jnp.maximum(fq_count - 1, 0)                    # [C]
    last_oh = fq_iota[:, None] == last_idx[None, :]            # [FQ,C]
    last_len_is_1 = jnp.where(last_oh, fq_lens, 0).sum(axis=0) == 1
    target = jnp.where(last_oh, fq_chars[:, 0, :], 0).sum(axis=0)  # [C]
    enabled = last_len_is_1 & fq_last_is_alpha

    def prec_step(i, st):
        d_index, first_match, alive = st
        is_prec = i < fq_count - 1
        contains = F_CONT[i]                                   # [D,C]
        eligible = contains & (d_iota[:, None] >= d_index[None, :])
        found = eligible.any(axis=0)
        j = jnp.argmax(eligible, axis=0).astype(jnp.int32)
        step_on = alive & is_prec
        first_match = jnp.where(step_on & found & (first_match == -1),
                                j, first_match)
        d_index = jnp.where(step_on & found, j, d_index)
        alive = jnp.where(step_on, alive & found, alive)
        return d_index, first_match, alive

    d_index, first_match, alive = jax.lax.fori_loop(
        0, max(FQ - 1, 0), prec_step,
        (jnp.zeros((C,), jnp.int32), jnp.full((C,), -1, jnp.int32),
         jnp.full((C,), True)))

    nxt = d_index + 1
    nxt_oh = d_iota[:, None] == jnp.minimum(nxt, D - 1)[None, :]  # [D,C]
    nxt_valid = (all_valid & nxt_oh).any(axis=0) & (nxt < D)
    nxt_first = jnp.where(nxt_oh, first_char, 0).sum(axis=0)
    nxt_len = jnp.where(nxt_oh, lens, 0).sum(axis=0)
    adj = (adj_ws & (d_iota[:, None] == d_index[None, :])).any(axis=0)

    hit = enabled & alive & nxt_valid & (nxt_first == target) & adj
    boost = 8 + jnp.maximum(0, 16 - first_match)
    boost = boost + jnp.where(nxt_len == 1, 4, 0)
    return jnp.where(hit, boost, 0)


def _fusion_score_impl(C, Q, f32, q_iota, q_count, query_len, text_len,
                       terms_with_any, terms_fully, terms_strict,
                       terms_prefix, first_match_index, sum_ci, word_hits,
                       doc_token_count, longest_run, suffix_run,
                       preceding_strict, last_token_has_prefix,
                       type_ahead, idf_coverage, total_idf, missing_idf,
                       q_word_idf, ci, has_term, sig, base_scores):
    # Per-candidate shapes: q_count/query_len/text_len [C],
    # q_word_idf/ci/has_term [Q,C] (gathered by the caller via qsel).
    fq_count = sig["_fq_count"]
    n = jnp.where(fq_count > 0, fq_count, q_count)
    is_single = n <= 1

    tc = q_count
    is_complete = (tc > 0) & (terms_with_any == tc)
    is_clean = (tc > 0) & (terms_prefix == tc)
    is_exact = (tc > 0) & (terms_strict == tc)
    starts_at_beginning = first_match_index == 0
    lpl = sig["lexical_prefix_last"]
    preceding_terms = jnp.maximum(0, tc - 1)
    coverage_prefix_last = (tc >= 1) & \
        (preceding_strict == preceding_terms) & last_token_has_prefix
    prefix_last_strong = lpl & coverage_prefix_last
    perfect_doc = sig["is_perfect_doc"]

    precedence = jnp.zeros((C,), jnp.int32)

    matched = terms_with_any
    coverage_tier = jnp.where(
        matched >= tc, 3,
        jnp.where(matched == tc - 1, 2,
                  jnp.where(matched * 2 >= tc, 1, 0)))
    coverage_tier = jnp.where(~is_single & (tc > 0), coverage_tier, 0)
    precedence = precedence | jnp.where(
        ~is_single & (coverage_tier > 0), (coverage_tier & 0b11) << 16, 0)

    exact_prefix = ~is_single & is_clean & starts_at_beginning & lpl & \
        is_complete
    subset_match = ~is_single & (doc_token_count > 0) & \
        (word_hits == doc_token_count)
    precedence = precedence | jnp.where(exact_prefix, 1 << 15, 0)
    precedence = precedence | jnp.where(subset_match, 1 << 14, 0)

    avg_idf = jnp.where((total_idf > 0) & (tc > 0),
                        total_idf / jnp.maximum(tc, 1).astype(f32), 0.0)
    power = q_word_idf * ci                                     # [Q,C]
    total_power = jnp.where(has_term, power, 0.0).sum(axis=0)
    cand_ok = has_term & (ci > 0.1) & (q_word_idf > 0.0) & \
        (q_word_idf >= avg_idf[None, :])
    others = total_power[None, :] - power
    dominance_on = ~is_single & (tc >= 2)
    dominant = (cand_ok & (power >= others)).any(axis=0) & dominance_on
    strong_anchor = sig["has_anchor_stem"] & \
        (q_word_idf[0] >= avg_idf) & dominance_on
    precedence = precedence | jnp.where(dominant | strong_anchor, 1 << 13, 0)
    unmatched_terms = tc - terms_with_any
    precedence = precedence | jnp.where(
        dominant & (unmatched_terms == 1), 8, 0)

    st_tier = jnp.where(
        is_complete,
        jnp.where(starts_at_beginning,
                  jnp.where(is_exact, 4, jnp.where(is_clean, 3, 0)),
                  jnp.where(is_exact, 2, jnp.where(is_clean, 1, 0))),
        0)
    single_prec = jnp.where(is_complete, 1 << 17, 0) | \
        jnp.where(is_clean & (tc > 0), 1 << 16, 0) | (st_tier << 3)

    anchor_run = sig["has_anchor_stem"] & (longest_run >= 2)
    mt_tier = jnp.where(
        prefix_last_strong, 3,
        jnp.where(lpl, 2, jnp.where(perfect_doc | anchor_run, 1, 0)))
    mt_prec = mt_tier + jnp.where(fq_count > tc, sig["single_char_boost"], 0)

    precedence = precedence | jnp.where(is_single, single_prec, mt_prec)

    coverage_ratio = jnp.where(
        tc > 0, terms_with_any.astype(f32) / jnp.maximum(tc, 1).astype(f32),
        0.0)
    has_partial = (coverage_ratio > 0.0) & (coverage_ratio < 1.0)

    last_matched = last_token_has_prefix | ((tc > 0) & (terms_with_any == tc))
    can_boost = (last_matched | ~type_ahead) & (total_idf > 0)
    missing_ratio = missing_idf / jnp.maximum(total_idf, 1e-30)
    term_gap = 1.0 - coverage_ratio
    info_boost = (unmatched_terms == 1) & can_boost & \
        (missing_ratio < term_gap)
    boost_bit = jnp.where(sig["has_stem_evidence"], True, info_boost)
    precedence = precedence | jnp.where(
        has_partial & (n >= 2) & boost_bit, 8, 0)

    avg_ci = jnp.where(tc > 0, sum_ci / jnp.maximum(tc, 1).astype(f32), 0.0)
    lexical_sim = sig["single_sim"].astype(f32) / 255.0
    sem_single = (avg_ci + lexical_sim) / 2.0

    use_idf_cov = has_partial & (unmatched_terms == 1) & can_boost & \
        (idf_coverage > coverage_ratio)
    base_cov = jnp.where(use_idf_cov, idf_coverage, avg_ci)
    density = word_hits.astype(f32) / jnp.maximum(doc_token_count, 1).astype(f32)
    sem_multi = base_cov * density
    signals = (sig["has_anchor_stem"].astype(jnp.int32) +
               (suffix_run >= 2).astype(jnp.int32))
    sem_multi = jnp.where(
        (tc >= 3) & (signals > 0),
        jnp.minimum(1.0, sem_multi + INTENT_BONUS_PER_SIGNAL *
                    signals.astype(f32)),
        sem_multi)
    t_density = sig["trailing_density"].astype(f32) / 255.0
    sem_multi = jnp.where(
        (tc >= 2) & (t_density > 0.0),
        sem_multi + (1.0 - sem_multi) * t_density, sem_multi)

    semantic = jnp.where(
        is_single, sem_single,
        jnp.where(doc_token_count == 0, avg_ci, sem_multi))

    coverage_gap = 1.0 - coverage_ratio
    semantic = jnp.where(
        has_partial & (base_scores >= coverage_gap),
        coverage_ratio * semantic + coverage_gap * base_scores, semantic)
    semantic = jnp.clip(semantic, 0.0, 0.999)

    focus = jnp.minimum(
        1.0, query_len.astype(f32) / jnp.maximum(text_len, 1).astype(f32))
    tiebreaker = jnp.where((n >= 2) & (text_len > 0),
                           (focus * 255.0).astype(jnp.int32), 0)

    return precedence.astype(f32) + semantic, tiebreaker
