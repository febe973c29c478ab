"""MXU char-n-gram signature matching for fuzzy (LD1) term expansion.

Replaces the host symmetric-delete dictionary (O(vocab x len) build, GBs
at 1M-doc vocabularies) with the north-star design: each vocabulary term
gets a 128-bit character-bigram signature; an unknown query token is
matched against the whole vocabulary with ONE [T,S]x[S,V] int8 matrix
product on the MXU, and the short list is verified exactly on host.

Correctness invariant (no false negatives): if damerau_lev(q, t) <= 1
then the edit changes at most 3 bigram instances of q (an adjacent
transposition rewrites 3 consecutive bigrams; an insert/delete/substitute
rewrites at most 2), so at most 3 distinct elements leave q's bigram
*set*; hashing can only merge bits, therefore
``popcount(sig_q & sig_t) >= popcount(sig_q) - 3`` (and symmetrically for
t). Terms failing this bound (or ``|len(q)-len(t)| > 1``) cannot be
Damerau-LD1 matches and are filtered before the exact verify, which makes
the final result identical to scanning the entire vocabulary.

Reference capability: Infidex ``Fst/FstIndex.cs:202-352`` (Myers
bit-parallel edit-distance-1 traversal over the trie); parity semantics
are those of ``VectorModel.ExpandMissingTerm`` (plain Levenshtein <= 1,
candidates sorted by term id, capped at 1024).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

#: signature width in bits == MXU contraction depth
SIG_BITS = 128
#: device short-list per token (lowest term ids among filter passers)
SHORTLIST = 8192
#: final cap after exact verification (FstIndex traversal cap)
MATCH_CAP = 1024


def _bigram_bits(text: str) -> np.ndarray:
    """Indices of the set bits of a string's hashed-bigram signature."""
    if len(text) < 2:
        return np.zeros(0, dtype=np.int64)
    codes = np.frombuffer(text.encode("utf-32-le", "surrogatepass"),
                          dtype=np.uint32).astype(np.int64)
    h = (codes[:-1] * 131 + codes[1:]) % SIG_BITS
    return np.unique(h)


def _signature_row(text: str) -> np.ndarray:
    row = np.zeros(SIG_BITS, dtype=np.int8)
    row[_bigram_bits(text)] = 1
    return row


@functools.partial(jax.jit, static_argnames=("cap",))
def _match_kernel(sig_t, vpop, vlen, elig, qsig, qpop, qlen, *, cap):
    """One MXU pass: [T,S] x [S,V] -> common-bit counts -> masked id top-k.

    Returns int32 [T, cap] of the lowest eligible term ids passing the
    signature and length prefilters; entries == V are padding.
    """
    v = sig_t.shape[1]
    # int8 x int8 -> int32 on the MXU
    common = jax.lax.dot_general(
        qsig, sig_t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                     # [T, V]
    ok = (common >= qpop[:, None] - 3) & (common >= vpop[None, :] - 3)
    ok &= jnp.abs(vlen[None, :] - qlen[:, None]) <= 1
    ok &= elig[None, :]
    # lowest ids == top-k of the negated ids; f32 keys (exact below
    # 2^24) hit TPU's fast PartialReduce — int32 top_k falls back to a
    # sort (index/device.py stable_top_k note).
    ids = jax.lax.broadcasted_iota(jnp.float32, ok.shape, 1)
    masked = jnp.where(ok, ids, jnp.float32(v))
    neg_top, _ = jax.lax.top_k(-masked, cap)
    return (-neg_top).astype(jnp.int32)


def _ext_bucket(n: int) -> int:
    for b in (16, 64, 256, 1024, 4096):
        if n <= b:
            return b
    return n


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                   static_argnames=("flip",))
def _extend_update(sig_t, vpop, vlen, elig, new_sig_t, new_pop, new_len,
                   new_elig, off_ids, start, flip):
    if flip:
        elig = elig.at[off_ids].set(False)
    dus = jax.lax.dynamic_update_slice
    sig_t = dus(sig_t, new_sig_t, (0, start))
    vpop = dus(vpop, new_pop, (start,))
    vlen = dus(vlen, new_len, (start,))
    elig = dus(elig, new_elig, (start,))
    return sig_t, vpop, vlen, elig


class NGramSignatureIndex:
    """Device-resident signature matrix over the vocabulary.

    Built once per ``BuiltIndex`` image (invalidated together with the
    host LD1 dictionary); ``match_batch`` resolves any number of unknown
    tokens with a single device round trip.
    """

    #: vocab-axis headroom beyond the next 128 multiple: append-only
    #: finalizes extend the matrix in place (2MB of int8 per 16k slots)
    APPEND_SLACK = 16384

    def __init__(self, terms: Sequence[str], df: np.ndarray, min_len: int = 3):
        v = len(terms)
        self.v = v
        self.min_len = min_len
        v_pad = max(128, -(-(v + self.APPEND_SLACK) // 128) * 128)
        sig = np.zeros((v_pad, SIG_BITS), dtype=np.int8)
        lens = np.zeros(v_pad, dtype=np.int32)
        elig = np.zeros(v_pad, dtype=bool)
        for tid, term in enumerate(terms):
            if len(term) < min_len or df[tid] <= 0:
                continue
            elig[tid] = True
            lens[tid] = len(term)
            sig[tid, _bigram_bits(term)] = 1
        # [S, V] layout: the matmul contracts over S
        self._sig_t = jnp.asarray(sig.T)
        self._vpop = jnp.asarray(sig.sum(axis=1, dtype=np.int32))
        self._vlen = jnp.asarray(lens)
        self._elig = jnp.asarray(elig)
        self._terms = terms

    def extend_append(self, terms: Sequence[str], df: np.ndarray,
                      new_start: int, off_tids=()) -> bool:
        """Extend in place after an append-only finalize: signature
        columns for terms ``new_start..`` plus eligibility flips for
        ``off_tids`` (terms that became stop terms). Existing terms'
        signatures/lengths never change (the string is the key), and a
        growing df cannot flip an eligible term off — so this produces
        the same state as a fresh build, without the O(vocab) Python
        signature loop (~10s+ at 1M-doc vocabularies, previously paid on
        the first fuzzy query after EVERY incremental finalize). Returns
        False on capacity overflow (caller rebuilds)."""
        k = len(terms) - self.v
        if k < 0 or new_start != self.v:
            return False
        v_pad = int(self._vlen.shape[0])
        if k == 0 and not off_tids:
            self._terms = terms
            return True
        k_pad = _ext_bucket(max(k, 1))
        if self.v + k_pad > v_pad:
            return False
        sig = np.zeros((k_pad, SIG_BITS), dtype=np.int8)
        lens = np.zeros(k_pad, dtype=np.int32)
        elig = np.zeros(k_pad, dtype=bool)
        for i in range(k):
            term = terms[self.v + i]
            if len(term) < self.min_len or df[self.v + i] <= 0:
                continue
            elig[i] = True
            lens[i] = len(term)
            sig[i, _bigram_bits(term)] = 1
        off = np.asarray(list(off_tids) or [self.v], np.int32)
        off_pad = np.full(_ext_bucket(off.size), off[0], np.int32)
        off_pad[: off.size] = off
        # a padded off entry repeats a real one (idempotent flip); with
        # no flips it points at the first NEW column, whose eligibility
        # the update writes afterwards anyway
        flip = bool(off_tids)
        (self._sig_t, self._vpop, self._vlen,
         self._elig) = _extend_update(
            self._sig_t, self._vpop, self._vlen, self._elig,
            jnp.asarray(sig.T), jnp.asarray(sig.sum(axis=1, dtype=np.int32)),
            jnp.asarray(lens), jnp.asarray(elig), jnp.asarray(off_pad),
            np.int32(self.v), flip)
        self.v += k
        self._terms = terms
        return True

    def candidates_batch(self, tokens: List[str]) -> List[np.ndarray]:
        """Signature-filtered candidate term ids per token (unverified)."""
        if not tokens:
            return []
        t = len(tokens)
        t_pad = max(8, -(-t // 8) * 8)
        qsig = np.zeros((t_pad, SIG_BITS), dtype=np.int8)
        qlen = np.zeros(t_pad, dtype=np.int32)
        for i, tok in enumerate(tokens):
            qsig[i] = _signature_row(tok)
            qlen[i] = len(tok)
        qpop = qsig.sum(axis=1, dtype=np.int32)
        cap = min(SHORTLIST, int(self._sig_t.shape[1]))
        out = _match_kernel(
            self._sig_t, self._vpop, self._vlen, self._elig,
            jnp.asarray(qsig), jnp.asarray(qpop), jnp.asarray(qlen),
            cap=cap)
        out = np.asarray(jax.device_get(out))
        results = []
        for i in range(t):
            row = out[i]
            results.append(row[row < self.v].astype(np.int64))
        return results

    def match_batch(self, tokens: List[str],
                    verify) -> List[np.ndarray]:
        """Exact LD1 matches per token: device prefilter + host verify.

        ``verify(token, term) -> bool`` applies the exact edit-distance
        predicate (plain Levenshtein <= 1 in the reference semantics).
        """
        cand_lists = self.candidates_batch(tokens)
        results = []
        for tok, cands in zip(tokens, cand_lists):
            matched = [int(tid) for tid in cands
                       if verify(tok, self._terms[int(tid)])]
            results.append(np.asarray(sorted(matched)[:MATCH_CAP],
                                      dtype=np.int64))
        return results
