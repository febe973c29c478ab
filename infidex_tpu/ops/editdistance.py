"""Batched edit distance on the VPU: Levenshtein + the Damerau rescue.

Behavioral reference: Infidex ``Metrics/LevenshteinDistance.cs``. The device
versions compute, for ONE query token against a [C, D] tensor of candidate
doc tokens, exactly what the scalar oracle computes pairwise:

* ``batched_levenshtein`` — plain DP clamped at budget+1 (callers only
  compare <= budget, so clamping preserves behavior).
* ``batched_damerau`` — Levenshtein with budget max+1 then, when the result
  is exactly max+1, a first-mismatch adjacent-transposition rescue worth
  1 + lev(rest) (LevenshteinDistance.cs:281-341, replicated quirk-for-quirk:
  only the FIRST mismatch is examined, and the swap partner bounds-checks
  against the target).

Char tensors are int32 code units, zero-padded; lengths are explicit.
Everything is jnp so XLA fuses the DP sweeps into VPU loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _propagate_insertions(row: jax.Array) -> jax.Array:
    """row[i] = min_{j<=i}(row[j] + i - j): min-plus prefix via cummin.

    Left-to-right insertion propagation of the DP row, done as
    i + cummin(row - i) so it stays a single fused vector pass.
    """
    iota = jnp.arange(row.shape[-1], dtype=row.dtype)
    return iota + jax.lax.cummin(row - iota, axis=row.ndim - 1)


@functools.partial(jax.jit, static_argnames=("budget", "l_max"))
def batched_levenshtein(q_chars: jax.Array,   # int32 [Lq]
                        q_len: jax.Array,     # int32 scalar
                        d_chars: jax.Array,   # int32 [C, D, L]
                        d_lens: jax.Array,    # int32 [C, D]
                        *, budget: int, l_max: int) -> jax.Array:
    """min(lev(q, d), budget+1) for every (c, d) pair. Shape [C, D]."""
    C, D, L = d_chars.shape
    lq = q_chars.shape[0]
    big = jnp.int32(budget + 1)

    # Initial row: costs[i] = i for i <= q_len else clamp-large (unused).
    iota = jnp.arange(lq + 1, dtype=jnp.int32)
    row0 = jnp.broadcast_to(iota, (C, D, lq + 1))

    def step(carry, k):
        row = carry
        d_char = d_chars[:, :, k]
        d_valid = k < d_lens
        prev_diag = row[..., :-1]
        sub_cost = jnp.where(q_chars[None, None, :] == d_char[..., None], 0, 1)
        diag = prev_diag + sub_cost
        up = row[..., 1:] + 1
        first = jnp.full((C, D, 1), k + 1, dtype=jnp.int32)
        new_row = jnp.concatenate([first, jnp.minimum(diag, up)], axis=-1)
        new_row = _propagate_insertions(new_row)
        row = jnp.where(d_valid[..., None], new_row, row)
        return row, None

    row, _ = jax.lax.scan(step, row0, jnp.arange(min(L, l_max), dtype=jnp.int32))
    dist = jnp.take_along_axis(
        row, jnp.broadcast_to(q_len, (C, D))[..., None].astype(jnp.int32),
        axis=-1)[..., 0]
    # Empty-side semantics: lev("", d) = len(d); lev(q, "") = len(q).
    dist = jnp.where(q_len == 0, d_lens, dist)
    dist = jnp.where(d_lens == 0, jnp.broadcast_to(q_len, (C, D)), dist)
    return jnp.minimum(dist, big)


@functools.partial(jax.jit, static_argnames=("max_distance", "l_max"))
def batched_damerau(q_chars: jax.Array,   # int32 [Lq]
                    q_len: jax.Array,     # int32 scalar
                    d_chars: jax.Array,   # int32 [C, D, L]
                    d_lens: jax.Array,    # int32 [C, D]
                    *, max_distance: int, l_max: int) -> jax.Array:
    """Reference CalculateDamerau, batched. Returns values clamped so that
    any result > max_distance means "no match" (callers compare <=)."""
    C, D, L = d_chars.shape
    lq = q_chars.shape[0]
    no = jnp.int32(max_distance + 1)

    len_diff_ok = jnp.abs(d_lens - q_len) <= max_distance

    dist = batched_levenshtein(q_chars, q_len, d_chars, d_lens,
                               budget=max_distance + 1, l_max=l_max)

    # Transposition rescue when dist == max_distance + 1
    # (LevenshteinDistance.cs:295-338).
    # First mismatch position p: smallest k with q[k] != d[k] (k < len(q)-1
    # by the loop bound i < len-1; also requires k < len(d)).
    k_idx = jnp.arange(lq, dtype=jnp.int32)
    q_b = q_chars[None, None, :]
    d_b = d_chars[..., :lq] if L >= lq else jnp.pad(
        d_chars, ((0, 0), (0, 0), (0, lq - L)))
    neq = (q_b != d_b)
    in_scan = (k_idx[None, None, :] < (q_len - 1)) & \
              (k_idx[None, None, :] < d_lens[..., None])
    mismatch = neq & in_scan
    has_mismatch = mismatch.any(axis=-1)
    p = jnp.argmax(mismatch, axis=-1).astype(jnp.int32)  # first mismatch

    # Swap validity: p+1 < len(d) and q[p]==d[p+1] and q[p+1]==d[p]
    p1_ok = (p + 1) < d_lens
    q_p = q_chars[jnp.minimum(p, lq - 1)]
    q_p1 = q_chars[jnp.minimum(p + 1, lq - 1)]
    d_p = jnp.take_along_axis(d_chars, p[..., None], axis=-1)[..., 0]
    d_p1 = jnp.take_along_axis(
        d_chars, jnp.minimum(p + 1, L - 1)[..., None], axis=-1)[..., 0]
    swap_fixes = p1_ok & (q_p == d_p1) & (q_p1 == d_p)

    remaining = max_distance - 1
    if remaining >= 0:
        # lev(q[p+2:], d[p+2:]) with budget `remaining`.
        shift = p + 2
        k2 = jnp.arange(lq, dtype=jnp.int32)
        q_rest = q_chars[jnp.minimum(shift[..., None] + k2[None, None, :],
                                     lq - 1)]
        q_rest = jnp.where(shift[..., None] + k2[None, None, :] < q_len,
                           q_rest, 0)
        q_rest_len = jnp.maximum(q_len - shift, 0)
        d_idx = jnp.minimum(shift[..., None] + k2[None, None, :], L - 1)
        d_rest = jnp.take_along_axis(
            d_chars, d_idx, axis=-1)
        d_rest = jnp.where(shift[..., None] + k2[None, None, :] < d_lens[..., None],
                           d_rest, 0)
        d_rest_len = jnp.maximum(d_lens - shift, 0)
        rest_dist = _batched_lev_pairwise(
            q_rest, q_rest_len, d_rest, d_rest_len,
            budget=remaining if remaining > 0 else 0, l_max=lq)
        rescue_ok = swap_fixes & (rest_dist <= remaining)
        rescued = 1 + rest_dist
    else:
        rescue_ok = jnp.zeros((C, D), dtype=bool)
        rescued = jnp.full((C, D), no)

    use_rescue = (dist > max_distance) & (dist <= max_distance + 1) & \
        has_mismatch & rescue_ok
    result = jnp.where(use_rescue, rescued, dist)
    return jnp.where(len_diff_ok, result, no)


def _batched_lev_pairwise(q_chars, q_lens, d_chars, d_lens, *, budget, l_max):
    """Levenshtein where BOTH sides vary per (c, d) pair.

    q_chars: [C, D, Lq], q_lens: [C, D]; d likewise. Used by the Damerau
    rescue on per-pair suffixes.
    """
    C, D, LQ = q_chars.shape
    L = d_chars.shape[-1]
    iota = jnp.arange(LQ + 1, dtype=jnp.int32)
    row0 = jnp.broadcast_to(iota, (C, D, LQ + 1))

    def step(row, k):
        d_char = jnp.take_along_axis(
            d_chars, jnp.full((C, D, 1), k, jnp.int32), axis=-1)[..., 0]
        d_valid = k < d_lens
        sub_cost = jnp.where(q_chars == d_char[..., None], 0, 1)
        diag = row[..., :-1] + sub_cost
        up = row[..., 1:] + 1
        first = jnp.full((C, D, 1), k + 1, dtype=jnp.int32)
        new_row = jnp.concatenate([first, jnp.minimum(diag, up)], axis=-1)
        new_row = _propagate_insertions(new_row)
        row = jnp.where(d_valid[..., None], new_row, row)
        return row, None

    row, _ = jax.lax.scan(step, row0, jnp.arange(min(L, l_max), dtype=jnp.int32))
    dist = jnp.take_along_axis(row, q_lens[..., None], axis=-1)[..., 0]
    dist = jnp.where(q_lens == 0, d_lens, dist)
    dist = jnp.where(d_lens == 0, q_lens, dist)
    return jnp.minimum(dist, budget + 1)
