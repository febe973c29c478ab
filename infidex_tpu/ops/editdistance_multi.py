"""Multi-query banded edit distance: all query tokens vs all doc tokens in
ONE banded DP sweep.

Computes [C, Q, D] distances in a single scan instead of Q separate DP
instances — the compile-time and bandwidth fix for ops/coverage_kernel.py.

* ``batched_lev_multi``: banded Levenshtein, band half-width = budget, state
  [C, Q, D, 2*budget+1]. Exact min(dist, budget+1) (entries outside the band
  can never be < budget+1).
* ``batched_damerau_multi``: the reference CalculateDamerau
  (Metrics/LevenshteinDistance.cs:281-341) with the first-mismatch
  transposition rescue evaluated in closed form: the rescue's residual
  lev(q[p+2:], d[p+2:]) <= 1 test reduces to aligned-prefix + common-suffix
  run lengths (no second DP).

Property-tested against utils/metrics.py in tests/test_editdistance_device.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cummin_plus(row: jax.Array) -> jax.Array:
    """row[o] = min_{o'<=o}(row[o'] + (o - o')) along the last axis."""
    iota = jnp.arange(row.shape[-1], dtype=row.dtype)
    return iota + jax.lax.cummin(row - iota, axis=row.ndim - 1)


@functools.partial(jax.jit, static_argnames=("budget", "l_max"))
def batched_lev_multi(q_chars: jax.Array,   # int32 [Q, L]
                      q_lens: jax.Array,    # int32 [Q]
                      d_chars: jax.Array,   # int32 [C, D, L]
                      d_lens: jax.Array,    # int32 [C, D]
                      *, budget: int, l_max: int) -> jax.Array:
    """min(lev(q_i, d_cd), budget+1) for every (c, i, d). Shape [C, Q, D]."""
    C, D, L = d_chars.shape
    Q = q_chars.shape[0]
    B = budget
    W = 2 * B + 1
    big = jnp.int32(budget + 1)
    # d_lens may be [C, D] (shared across queries) or [C, Q, D]
    # (per-query clamped lengths, e.g. prefix-window variants).
    d_len3 = d_lens[:, None, :] if d_lens.ndim == 2 else d_lens

    # Band state: cost[..., o] is the DP value at (i = j + (o - B)) for the
    # current column j. Column 0: cost(i, 0) = i.
    o_iota = jnp.arange(W, dtype=jnp.int32)           # o index
    off = o_iota - B                                  # diagonal offset i - j
    init = jnp.where(off >= 0, off, big + 1)          # i = off at j=0
    row0 = jnp.broadcast_to(init, (C, Q, D, W)).astype(jnp.int32)
    row0 = jnp.minimum(row0, big + 1)

    q_len_b = q_lens[None, :, None]                   # [1,Q,1]

    def step(row, j):
        # j is 0-based text index; column number = j+1.
        d_char = d_chars[:, None, :, j]                # [C,1,D]
        # q char at i-1 = (j+1) + off - 1 = j + off
        qi = j + off                                   # [W]
        qi_clip = jnp.clip(qi, 0, q_chars.shape[1] - 1)
        q_at = q_chars[:, qi_clip]                     # [Q,W]
        valid_i = (qi >= 0) & (qi[None, :] < q_lens[:, None])  # [Q,W]

        sub = jnp.where(q_at[None, :, None, :, ] == d_char[..., None], 0, 1)
        # i==0 row (all-insertions): cost = column number = j+1 at off = -(j+1)
        diag = row + sub                               # offset preserved
        up = jnp.concatenate(
            [row[..., 1:], jnp.full((C, Q, D, 1), big + 1)], axis=-1) + 1
        base = jnp.minimum(diag, up)
        # boundary: i == 0 -> cost = j+1 (only representable when j+1 <= B)
        i_here = (j + 1) + off                         # [W] value of i at col j+1
        base = jnp.where((i_here[None, None, None, :] == 0),
                         jnp.minimum(base, j + 1), base)
        new_row = _cummin_plus(base)
        # invalid i positions get big
        iv = (i_here >= 0) & (i_here[None, :] <= q_lens[:, None])   # [Q,W]
        new_row = jnp.where(iv[None, :, None, :], new_row, big + 1)
        new_row = jnp.minimum(new_row, big + 1)
        d_valid = j < d_len3                           # [C,1|Q,D]
        row = jnp.where(d_valid[..., None], new_row, row)
        return row, None

    row, _ = jax.lax.scan(step, row0, jnp.arange(min(L, l_max), dtype=jnp.int32))

    # Result at i = q_len, j = d_len -> offset o = q_len - d_len + B.
    o_final = q_lens[None, :, None] - d_len3 + B                  # [C,Q,D]
    o_final = jnp.broadcast_to(o_final, (C, Q, D))
    in_band = (o_final >= 0) & (o_final < W)
    o_idx = jnp.clip(o_final, 0, W - 1)
    dist = jnp.take_along_axis(row, o_idx[..., None], axis=-1)[..., 0]
    dist = jnp.where(in_band, dist, big)
    # Degenerate sides
    dist = jnp.where(q_len_b == 0, jnp.broadcast_to(d_len3, (C, Q, D)), dist)
    dist = jnp.where(jnp.broadcast_to(d_len3 == 0, (C, Q, D)),
                     jnp.broadcast_to(q_len_b, (C, Q, D)), dist)
    return jnp.minimum(dist, big)


@functools.partial(jax.jit, static_argnames=("max_distance", "l_max"))
def batched_damerau_multi(q_chars: jax.Array,   # int32 [Q, L]
                          q_lens: jax.Array,    # int32 [Q]
                          d_chars: jax.Array,   # int32 [C, D, L]
                          d_lens: jax.Array,    # int32 [C, D]
                          *, max_distance: int, l_max: int) -> jax.Array:
    """Reference CalculateDamerau for every (c, q, d). Values above
    max_distance are clamped; callers compare <= max_distance."""
    C, D, L = d_chars.shape
    Q = q_chars.shape[0]
    no = jnp.int32(max_distance + 1)

    q_len_b = q_lens[None, :, None]                   # [1,Q,1]
    d_len_b = d_lens[:, None, :] if d_lens.ndim == 2 else d_lens  # [C,1|Q,D]
    len_diff_ok = jnp.abs(d_len_b - q_len_b) <= max_distance

    dist = batched_lev_multi(q_chars, q_lens, d_chars, d_lens,
                             budget=max_distance + 1, l_max=l_max)

    # --- transposition rescue (dist == max_distance + 1) ---------------
    # Aligned equality matrix over k: q[k] vs d[k].
    k_iota = jnp.arange(L, dtype=jnp.int32)
    eq = q_chars[None, :, None, :] == d_chars[:, None, :, :]      # [C,Q,D,L]

    # First mismatch p within k < q_len-1 and k < d_len.
    in_scan = (k_iota[None, None, None, :] < (q_len_b - 1)[..., None]) & \
              (k_iota[None, None, None, :] < d_len_b[..., None])
    mism = (~eq) & in_scan
    has_mism = mism.any(axis=-1)
    p = jnp.argmax(mism, axis=-1).astype(jnp.int32)               # [C,Q,D]

    # Swap check: p+1 < d_len, q[p]==d[p+1], q[p+1]==d[p]
    p1_ok = (p + 1) < d_len_b
    qL = q_chars.shape[1]
    q_p = jnp.take_along_axis(
        jnp.broadcast_to(q_chars[None, :, None, :], (C, Q, D, qL)),
        jnp.minimum(p, qL - 1)[..., None], axis=-1)[..., 0]
    q_p1 = jnp.take_along_axis(
        jnp.broadcast_to(q_chars[None, :, None, :], (C, Q, D, qL)),
        jnp.minimum(p + 1, qL - 1)[..., None], axis=-1)[..., 0]
    d_b = jnp.broadcast_to(d_chars[:, None, :, :], (C, Q, D, L))
    d_p = jnp.take_along_axis(d_b, jnp.minimum(p, L - 1)[..., None],
                              axis=-1)[..., 0]
    d_p1 = jnp.take_along_axis(d_b, jnp.minimum(p + 1, L - 1)[..., None],
                               axis=-1)[..., 0]
    swap_fixes = p1_ok & (q_p == d_p1) & (q_p1 == d_p)

    remaining = max_distance - 1
    if remaining >= 0:
        # rest = (q[p+2:], d[p+2:]); need rest_dist and rest_dist <= remaining.
        shorter = jnp.minimum(q_len_b, d_len_b)                   # [C,1/Q,D]
        shorter = jnp.broadcast_to(shorter, (C, Q, D))
        rest_q_len = jnp.maximum(q_len_b - (p + 2), 0)
        rest_d_len = jnp.maximum(d_len_b - (p + 2), 0)
        rest_short = jnp.minimum(rest_q_len, rest_d_len)
        rest_diff = jnp.abs(rest_q_len - rest_d_len)

        # Aligned common prefix of the rests: run of eq from k = p+2.
        after = k_iota[None, None, None, :] >= (p + 2)[..., None]
        within = k_iota[None, None, None, :] < \
            ((p + 2)[..., None] + rest_short[..., None])
        # mismatch positions in the aligned window
        window_mism = (~eq) & after & within
        any_wm = window_mism.any(axis=-1)
        first_wm = jnp.argmax(window_mism, axis=-1).astype(jnp.int32)
        aligned_prefix = jnp.where(any_wm, first_wm - (p + 2), rest_short)

        # Common suffix of the rests == common suffix of the full strings,
        # clamped to the rest length.
        rev_q_idx = jnp.clip(q_len_b[..., None] - 1 - k_iota[None, None, None, :],
                             0, qL - 1)
        rev_q_idx = jnp.broadcast_to(rev_q_idx, (C, Q, D, L))
        rev_q = jnp.take_along_axis(
            jnp.broadcast_to(q_chars[None, :, None, :], (C, Q, D, qL)),
            rev_q_idx, axis=-1)
        rev_d_idx = jnp.clip(d_len_b[..., None] - 1 - k_iota[None, None, None, :],
                             0, L - 1)
        rev_d = jnp.take_along_axis(d_b, rev_d_idx, axis=-1)
        rev_eq = (rev_q == rev_d) & \
            (k_iota[None, None, None, :] < shorter[..., None])
        rev_mism = ~rev_eq & (k_iota[None, None, None, :] < shorter[..., None])
        any_rm = rev_mism.any(axis=-1)
        suffix_run = jnp.where(any_rm,
                               jnp.argmax(rev_mism, axis=-1), shorter)
        suffix_run = jnp.minimum(suffix_run.astype(jnp.int32), rest_short)

        rest_equal = (rest_diff == 0) & (aligned_prefix >= rest_short)
        rest_lev1 = jnp.where(
            rest_diff == 0,
            aligned_prefix + suffix_run >= rest_short - 1,
            (rest_diff == 1) & (aligned_prefix + suffix_run >= rest_short))
        rest_dist = jnp.where(rest_equal, 0,
                              jnp.where(rest_lev1, 1, remaining + 1))
        rescue_ok = swap_fixes & (rest_dist <= remaining)
        rescued = 1 + rest_dist
    else:
        rescue_ok = jnp.zeros((C, Q, D), bool)
        rescued = jnp.full((C, Q, D), no)

    use_rescue = (dist > max_distance) & (dist <= max_distance + 1) & \
        has_mism & rescue_ok
    result = jnp.where(use_rescue, rescued, dist)
    return jnp.where(len_diff_ok, result, no)
