"""Multi-query banded edit distance: all query tokens vs all doc tokens in
ONE banded DP sweep, laid out for the TPU VPU.

Layout: the candidate axis C is MINOR (lanes) everywhere — [W, Q, D, C]
DP state, [Q, L, C] query chars, [L, D, C] doc chars. C is a multiple of
128, so every vector tile is fully utilized; with the old C-major layout
the minor (Q, D) dims covered ~6% of each (8, 128) tile and the sweep ran
~15x under the HBM roofline. The L recurrence is a statically unrolled
Python loop (static slices, cross-step fusion) rather than lax.scan.

* ``batched_lev_multi``: banded Levenshtein, band half-width = budget.
  Exact min(dist, budget+1).
* ``alignment_tensors``: aligned / one-shifted / reversed char equality
  [Q, L, D, C] — computed once and shared by every rescue application.
* ``damerau_rescue``: the reference CalculateDamerau transposition rescue
  (Metrics/LevenshteinDistance.cs:281-341) applied to clamped lev values.
  For max_distance == 1 the residual must be EQUAL (aligned equality only);
  for max_distance == 2 the residual lev<=1 test uses common-suffix runs
  from the reversed equality (only valid for unclamped doc lengths).
* ``batched_damerau_multi``: convenience wrapper (lev sweep + rescue).

Property-tested against utils/metrics.py in tests/test_editdistance_device.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp


def _cummin_plus_axis0(row: jax.Array) -> jax.Array:
    """row[o] = min_{o'<=o}(row[o'] + (o - o')) along axis 0 (band axis)."""
    iota = jnp.arange(row.shape[0], dtype=row.dtype).reshape(
        (-1,) + (1,) * (row.ndim - 1))
    return iota + jax.lax.cummin(row - iota, axis=0)


@functools.partial(jax.jit, static_argnames=("budget", "l_max"))
def batched_lev_multi(q_chars: jax.Array,   # int32 [Q, L] or [Q, L, C]
                      q_lens: jax.Array,    # int32 [Q] or [Q, C]
                      d_chars: jax.Array,   # int32 [L, D, C]
                      d_lens: jax.Array,    # int32 [D, C] or [Q, D, C]
                      *, budget: int, l_max: int) -> jax.Array:
    """min(lev(q_i, d_cd), budget+1) for every (i, d, c). Shape [Q, D, C].

    Query tensors may carry the per-candidate trailing axis (multi-query
    batches: each candidate belongs to a different query).
    """
    L, D, C = d_chars.shape
    q3 = q_chars if q_chars.ndim == 3 else q_chars[..., None]   # [Q,L,1|C]
    ql2 = q_lens if q_lens.ndim == 2 else q_lens[:, None]       # [Q,1|C]
    Q = q3.shape[0]
    Lq = q3.shape[1]
    B = budget
    W = 2 * B + 1
    big = jnp.int32(budget + 1)
    d_len3 = d_lens[None, :, :] if d_lens.ndim == 2 else d_lens  # [1|Q,D,C]

    off = np.arange(W, dtype=np.int32) - B            # diagonal offset i - j
    init = np.where(off >= 0, off, budget + 2).astype(np.int32)
    row = jnp.broadcast_to(jnp.asarray(init)[:, None, None, None],
                           (W, Q, D, C)).astype(jnp.int32)
    row = jnp.minimum(row, big + 1)

    steps = min(L, l_max)
    off_j = jnp.asarray(off)

    # Rolled DP recurrence (lax.fori_loop): the sweep is sequential either
    # way, and unrolling `steps` copies of the band update dominated the
    # coverage kernel's StableHLO size (remote compiles of the big shape
    # classes took minutes). The only structural change is the per-step
    # query-char gather (dynamic index instead of static slices).
    def step(j, row):
        d_char = d_chars[j]                            # [D, C]
        qi_clip = jnp.clip(j + off_j, 0, Lq - 1)       # [W]
        # [W, Q, 1, C]: query char at each band offset.
        q_at_w = jnp.transpose(jnp.take(q3, qi_clip, axis=1),
                               (1, 0, 2))[:, :, None, :]
        sub = jnp.where(q_at_w == d_char[None, None], 0, 1)
        diag = row + sub
        up = jnp.concatenate(
            [row[1:], jnp.full((1, Q, D, C), big + 1, jnp.int32)], axis=0) + 1
        base = jnp.minimum(diag, up)
        i_here = (j + 1) + off_j                       # [W]
        zero_mask = (i_here == 0)[:, None, None, None]
        base = jnp.where(zero_mask, jnp.minimum(base, j + 1), base)
        new_row = _cummin_plus_axis0(base)
        ih = i_here[:, None, None]                     # [W,1,1]
        iv = (ih >= 0) & (ih <= ql2[None])             # [W,Q,1|C]
        iv = iv[:, :, None] if iv.ndim == 3 else iv
        new_row = jnp.where(iv, new_row, big + 1)
        new_row = jnp.minimum(new_row, big + 1)
        d_valid = (j < d_len3)[None]                   # [1,1|Q,D,C]
        return jnp.where(d_valid, new_row, row)

    row = jax.lax.fori_loop(0, steps, step, row)

    o_iota = jnp.asarray(np.arange(W, dtype=np.int32))
    o_final = ql2[:, None, :] - d_len3 + B             # [Q,D,C]
    o_final = jnp.broadcast_to(o_final, (Q, D, C))
    sel = o_iota[:, None, None, None] == o_final[None]
    dist = jnp.min(jnp.where(sel, row, big), axis=0)
    q_len_b = ql2[:, None, :]
    dist = jnp.where(jnp.broadcast_to(q_len_b == 0, (Q, D, C)),
                     jnp.broadcast_to(d_len3, (Q, D, C)), dist)
    dist = jnp.where(jnp.broadcast_to(d_len3 == 0, (Q, D, C)),
                     jnp.broadcast_to(q_len_b, (Q, D, C)), dist)
    return jnp.minimum(dist, big)


def alignment_tensors(q_chars, d_chars, q_chars_rev=None, d_chars_rev=None):
    """(eq, eq_qd1, eq_q1d, rev_eq) in [Q, L, D, C] layout.

    eq[l]     = q[l] == d[l]
    eq_qd1[l] = q[l] == d[l+1]   (d shifted left by one)
    eq_q1d[l] = q[l+1] == d[l]   (q shifted left by one)
    rev_eq[l] = q_rev[l] == d_rev[l]  (None when rev inputs absent)

    q_chars: [Q, L] or [Q, L, C]; d_chars: [L, D, C].
    """
    L, D, C = d_chars.shape
    d_t = d_chars[None]                                          # [1,L,D,C]
    q3 = q_chars if q_chars.ndim == 3 else q_chars[..., None]    # [Q,L,1|C]
    q_t = q3[:, :, None, :]                                      # [Q,L,1,1|C]
    eq = q_t == d_t

    zpad_d = jnp.zeros((1, 1, D, C), d_chars.dtype)
    d_shift = jnp.concatenate([d_t[:, 1:], zpad_d], axis=1)
    eq_qd1 = q_t == d_shift

    zpad_q = jnp.zeros(q_t.shape[:1] + (1,) + q_t.shape[2:], q3.dtype)
    q_shift = jnp.concatenate([q_t[:, 1:], zpad_q], axis=1)
    eq_q1d = q_shift == d_t

    rev_eq = None
    if q_chars_rev is not None and d_chars_rev is not None:
        qr3 = (q_chars_rev if q_chars_rev.ndim == 3
               else q_chars_rev[..., None])
        rev_eq = qr3[:, :, None, :] == d_chars_rev[None]
    return eq, eq_qd1, eq_q1d, rev_eq


def damerau_rescue(dist, eq, eq_qd1, eq_q1d, q_lens, d_lens,
                   *, max_distance: int, rev_eq=None):
    """Reference transposition rescue on clamped lev distances.

    dist [Q,D,C] = min(lev, max_distance+2); eq/eq_qd1/eq_q1d [Q,L,D,C];
    d_lens [D,C] or [Q,D,C]. Returns CalculateDamerau-equivalent distances
    (clamped above max_distance).
    """
    L = eq.shape[1]
    no = jnp.int32(max_distance + 1)
    ql2 = q_lens if q_lens.ndim == 2 else q_lens[:, None]        # [Q,1|C]
    q_len_b = ql2[:, None, :]                                    # [Q,1,1|C]
    d_len3 = d_lens[None] if d_lens.ndim == 2 else d_lens        # [1|Q,D,C]
    len_diff_ok = jnp.abs(d_len3 - q_len_b) <= max_distance

    l_iota = jnp.asarray(np.arange(L, dtype=np.int32))[None, :, None, None]
    ql4 = ql2[:, None, None, :]                                  # [Q,1,1,1|C]
    dl4 = (d_lens[None, None] if d_lens.ndim == 2
           else d_lens[:, None])                                 # [1|Q,1,D,C]

    in_scan = (l_iota < (ql4 - 1)) & (l_iota < dl4)
    mism = (~eq) & in_scan
    has_mism = mism.any(axis=1)                                  # [Q,D,C]
    p = jnp.argmax(mism, axis=1).astype(jnp.int32)               # [Q,D,C]
    p4 = p[:, None]                                              # [Q,1,D,C]
    sel_p = l_iota == p4

    # Swap: p+1 < d_len, q[p]==d[p+1], q[p+1]==d[p]
    swap_at_p = (eq_qd1 & eq_q1d & sel_p).any(axis=1)
    p1_ok = (p + 1) < d_len3
    swap_fixes = p1_ok & swap_at_p

    remaining = max_distance - 1
    if remaining < 0:
        return jnp.where(len_diff_ok, dist, no)

    rest_q_len = jnp.maximum(q_len_b - (p + 2), 0)
    rest_d_len = jnp.maximum(d_len3 - (p + 2), 0)
    rest_short = jnp.minimum(rest_q_len, rest_d_len)
    rest_diff = jnp.abs(rest_q_len - rest_d_len)

    after = l_iota >= (p4 + 2)
    within = l_iota < (p4 + 2 + rest_short[:, None])
    window_mism = (~eq) & after & within
    any_wm = window_mism.any(axis=1)
    first_wm = jnp.argmax(window_mism, axis=1).astype(jnp.int32)
    aligned_prefix = jnp.where(any_wm, first_wm - (p + 2), rest_short)

    rest_equal = (rest_diff == 0) & (aligned_prefix >= rest_short)

    if remaining == 0:
        rest_dist = jnp.where(rest_equal, 0, 1)
        rescue_ok = swap_fixes & rest_equal
    else:
        if rev_eq is None:
            raise ValueError(
                "damerau_rescue with max_distance >= 2 requires rev_eq "
                "(and unclamped d_lens)")
        shorter4 = jnp.minimum(ql4, dl4)
        rev_mism = (~rev_eq) & (l_iota < shorter4)
        any_rm = rev_mism.any(axis=1)
        suffix_run = jnp.where(
            any_rm, jnp.argmax(rev_mism, axis=1).astype(jnp.int32),
            jnp.broadcast_to(jnp.minimum(q_len_b, d_len3), any_rm.shape))
        suffix_run = jnp.minimum(suffix_run, rest_short)
        rest_lev1 = jnp.where(
            rest_diff == 0,
            aligned_prefix + suffix_run >= rest_short - 1,
            (rest_diff == 1) & (aligned_prefix + suffix_run >= rest_short))
        rest_dist = jnp.where(rest_equal, 0,
                              jnp.where(rest_lev1, 1, remaining + 1))
        rescue_ok = swap_fixes & (rest_dist <= remaining)

    rescued = 1 + rest_dist
    use_rescue = (dist > max_distance) & (dist <= max_distance + 1) & \
        has_mism & rescue_ok
    result = jnp.where(use_rescue, rescued, dist)
    return jnp.where(len_diff_ok, result, no)


@functools.partial(jax.jit, static_argnames=("max_distance", "l_max"))
def batched_damerau_multi(q_chars: jax.Array,   # int32 [Q, L]
                          q_lens: jax.Array,    # int32 [Q]
                          d_chars: jax.Array,   # int32 [L, D, C]
                          d_lens: jax.Array,    # int32 [D, C] or [Q, D, C]
                          q_chars_rev: Optional[jax.Array] = None,
                          d_chars_rev: Optional[jax.Array] = None,
                          *, max_distance: int, l_max: int) -> jax.Array:
    """Convenience wrapper: lev sweep + rescue (see damerau_rescue)."""
    dist = batched_lev_multi(q_chars, q_lens, d_chars, d_lens,
                             budget=max_distance + 1, l_max=l_max)
    eq, eq_qd1, eq_q1d, rev_eq = alignment_tensors(
        q_chars, d_chars, q_chars_rev, d_chars_rev)
    return damerau_rescue(dist, eq, eq_qd1, eq_q1d, q_lens, d_lens,
                          max_distance=max_distance, rev_eq=rev_eq)
