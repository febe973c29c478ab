"""Property-test batched device edit distance vs the scalar host oracle."""

import random
import string

import numpy as np
import pytest

from infidex_tpu.ops.editdistance import batched_damerau, batched_levenshtein
from infidex_tpu.utils.metrics import calculate_damerau, levenshtein

L = 16
ALPHABET = "abcde"  # small alphabet makes collisions/edits likely


def encode(words, C, D):
    chars = np.zeros((C, D, L), dtype=np.int32)
    lens = np.zeros((C, D), dtype=np.int32)
    it = iter(words)
    for c in range(C):
        for d in range(D):
            w = next(it)
            lens[c, d] = len(w)
            for k, ch in enumerate(w[:L]):
                chars[c, d, k] = ord(ch)
    return chars, lens


def rand_word(rng, min_len=0, max_len=10):
    return "".join(rng.choice(ALPHABET)
                   for _ in range(rng.randint(min_len, max_len)))


@pytest.mark.parametrize("budget", [1, 2, 3])
def test_levenshtein_matches_oracle(budget):
    rng = random.Random(budget)
    C, D = 4, 8
    q = rand_word(rng, 1, 8)
    words = [rand_word(rng) for _ in range(C * D)]
    chars, lens = encode(words, C, D)
    q_arr = np.zeros(L, np.int32)
    for k, ch in enumerate(q):
        q_arr[k] = ord(ch)

    out = np.asarray(batched_levenshtein(
        q_arr, np.int32(len(q)), chars, lens, budget=budget, l_max=L))
    it = iter(words)
    for c in range(C):
        for d in range(D):
            w = next(it)
            expected = min(levenshtein(q, w), budget + 1)
            assert out[c, d] == expected, (q, w, out[c, d], expected)


@pytest.mark.parametrize("max_distance", [1, 2])
def test_damerau_matches_oracle(max_distance):
    rng = random.Random(100 + max_distance)
    C, D = 4, 16
    cases = 0
    for trial in range(6):
        q = rand_word(rng, 2, 8)
        words = []
        for _ in range(C * D):
            mode = rng.randint(0, 3)
            if mode == 0:
                words.append(rand_word(rng))
            else:
                # Perturb q: swap / sub / insert to hit the rescue path
                w = list(q)
                if mode == 1 and len(w) >= 2:
                    i = rng.randrange(len(w) - 1)
                    w[i], w[i + 1] = w[i + 1], w[i]
                elif mode == 2:
                    i = rng.randrange(len(w))
                    w[i] = rng.choice(ALPHABET)
                else:
                    w.insert(rng.randrange(len(w) + 1), rng.choice(ALPHABET))
                words.append("".join(w))
        chars, lens = encode(words, C, D)
        q_arr = np.zeros(L, np.int32)
        for k, ch in enumerate(q):
            q_arr[k] = ord(ch)
        out = np.asarray(batched_damerau(
            q_arr, np.int32(len(q)), chars, lens,
            max_distance=max_distance, l_max=L))
        it = iter(words)
        for c in range(C):
            for d in range(D):
                w = next(it)
                expected = calculate_damerau(q, w, max_distance)
                got = out[c, d]
                # Both clamp differently above the threshold; behavior is
                # defined by <= max_distance only.
                assert (got <= max_distance) == (expected <= max_distance), \
                    (q, w, got, expected)
                if expected <= max_distance:
                    assert got == expected, (q, w, got, expected)
                    cases += 1
    assert cases > 20  # the perturbations actually exercised matches


# ---------------------------------------------------------------------------
# Multi-query banded variants

from infidex_tpu.ops.editdistance_multi import (batched_damerau_multi,
                                                batched_lev_multi)


def encode_q(words, Q):
    chars = np.zeros((Q, L), dtype=np.int32)
    lens = np.zeros(Q, dtype=np.int32)
    for i, w in enumerate(words):
        lens[i] = len(w)
        for k, ch in enumerate(w[:L]):
            chars[i, k] = ord(ch)
    return chars, lens


@pytest.mark.parametrize("budget", [1, 2, 3])
def test_lev_multi_matches_oracle(budget):
    rng = random.Random(10 + budget)
    C, D, Q = 3, 8, 5
    qs = [rand_word(rng, 1, 8) for _ in range(Q)]
    words = [rand_word(rng) for _ in range(C * D)]
    chars, lens = encode(words, C, D)
    q_chars, q_lens = encode_q(qs, Q)
    out = np.asarray(batched_lev_multi(
        q_chars, q_lens, chars.transpose(2, 1, 0), lens.T,
        budget=budget, l_max=L))
    it = 0
    for c in range(C):
        for d in range(D):
            w = words[it]; it += 1
            for qi, q in enumerate(qs):
                expected = min(levenshtein(q, w), budget + 1)
                assert out[qi, d, c] == expected, (q, w, out[qi, d, c], expected)


@pytest.mark.parametrize("max_distance", [1, 2])
def test_damerau_multi_matches_oracle(max_distance):
    rng = random.Random(30 + max_distance)
    C, D, Q = 3, 12, 4
    matched = 0
    for trial in range(6):
        qs = [rand_word(rng, 2, 8) for _ in range(Q)]
        words = []
        for _ in range(C * D):
            base = rng.choice(qs)
            mode = rng.randint(0, 4)
            w = list(base)
            if mode == 0:
                words.append(rand_word(rng))
                continue
            if mode == 1 and len(w) >= 2:
                i = rng.randrange(len(w) - 1)
                w[i], w[i + 1] = w[i + 1], w[i]
            elif mode == 2:
                i = rng.randrange(len(w))
                w[i] = rng.choice(ALPHABET)
            elif mode == 3:
                w.insert(rng.randrange(len(w) + 1), rng.choice(ALPHABET))
            elif len(w) >= 2:
                del w[rng.randrange(len(w))]
            words.append("".join(w))
        chars, lens = encode(words, C, D)
        q_chars, q_lens = encode_q(qs, Q)
        chars_rev, _ = encode([w[::-1] for w in words], C, D)
        q_chars_rev, _ = encode_q([q[::-1] for q in qs], Q)
        out = np.asarray(batched_damerau_multi(
            q_chars, q_lens, chars.transpose(2, 1, 0), lens.T,
            q_chars_rev, chars_rev.transpose(2, 1, 0),
            max_distance=max_distance, l_max=L))
        it = 0
        for c in range(C):
            for d in range(D):
                w = words[it]; it += 1
                for qi, q in enumerate(qs):
                    expected = calculate_damerau(q, w, max_distance)
                    got = out[qi, d, c]
                    assert (got <= max_distance) == (expected <= max_distance), \
                        (q, w, got, expected)
                    if expected <= max_distance:
                        assert got == expected, (q, w, got, expected)
                        matched += 1
    assert matched > 50
