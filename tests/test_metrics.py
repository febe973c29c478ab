"""String metric oracles (reference: Metrics/*, LevenshteinDistanceTests.cs)."""

import pytest

from infidex_tpu.utils.metrics import (binomial_edit_threshold,
                                       calculate_damerau,
                                       calculate_prefix_distance,
                                       jaro_similarity,
                                       jaro_winkler_similarity, lcs,
                                       levenshtein,
                                       longest_common_subsequence)


class TestLevenshtein:
    @pytest.mark.parametrize("a,b,d", [
        ("", "", 0), ("abc", "", 3), ("", "abc", 3),
        ("kitten", "sitting", 3), ("abc", "abc", 0),
        ("abc", "abd", 1), ("abc", "acb", 2),
        ("flaw", "lawn", 2),
    ])
    def test_basic(self, a, b, d):
        assert levenshtein(a, b) == d

    def test_early_exit(self):
        assert levenshtein("abcdefgh", "zzzzzzzz", 2) == 3  # max+1

    def test_ignore_case(self):
        assert levenshtein("ABC", "abc", ignore_case=True) == 0


class TestDamerauRescue:
    def test_transposition_counts_one(self):
        assert calculate_damerau("teh", "the", 1, False) == 1

    def test_plain_distance_passthrough(self):
        assert calculate_damerau("cat", "bat", 1, False) == 1

    def test_len_diff_early_exit(self):
        assert calculate_damerau("a", "abcd", 1, False) == 2  # max+1

    def test_only_first_mismatch_examined(self):
        # "abXYcd" vs "abYXdc": two transpositions = lev 4; with budget 1 the
        # inner Calculate caps at (max+1)+1 = 3 and no swap rescue applies.
        assert calculate_damerau("abxycd", "abyxdc", 1, False) > 1

    def test_swap_plus_rest(self):
        # Rescue fires only when plain Levenshtein == max+1 (the C# quirk):
        # with budget 1, lev=2 triggers the transposition rescue -> 1.
        assert calculate_damerau("abxy", "baxy", 1, False) == 1
        # With budget 2, lev=2 is already within budget -> returned as-is.
        assert calculate_damerau("abxy", "baxy", 2, False) == 2

    def test_ignore_case(self):
        assert calculate_damerau("TEH", "the", 1, True) == 1


class TestPrefixDistance:
    def test_paper_example(self):
        # PLD("algro", "algorithm") = 1 (Bast & Celikik)
        assert calculate_prefix_distance("algro", "algorithm", 2) == 1

    def test_exact_prefix(self):
        assert calculate_prefix_distance("alg", "algorithm", 2) == 0

    def test_empty(self):
        assert calculate_prefix_distance("", "word") == 0
        assert calculate_prefix_distance("abc", "") == 3


class TestLcsContainment:
    def test_equal(self):
        assert lcs("abc", "abc", 0) == 3

    def test_containment(self):
        assert lcs("bat", "the batman", 0) == 3

    def test_prefix_plus_tolerance(self):
        # "battamam" vs "batman": prefix "bat"(3) + tol(1) = 4 (StringMetrics.cs:25)
        assert lcs("battamam", "batman", 1) == 4
        # "speeding" vs "speeds": prefix "speed"(5) + tol(1) = 6
        assert lcs("speeding", "speeds", 1) == 6

    def test_no_common_prefix(self):
        assert lcs("xyz", "abc", 2) == 0

    def test_capped_at_min_length(self):
        assert lcs("ab", "abcdef", 5) == 2


class TestTrueLcs:
    def test_subsequence(self):
        assert longest_common_subsequence("abcde", "ace") == 3


class TestJaro:
    def test_identical(self):
        assert jaro_similarity("abc", "abc") == 1.0

    def test_disjoint(self):
        assert jaro_similarity("abc", "xyz") == 0.0

    def test_winkler_prefix_bonus(self):
        assert jaro_winkler_similarity("martha", "marhta") > \
            jaro_similarity("martha", "marhta")


class TestBinomialModel:
    def test_thresholds(self):
        # EditDistanceModel.cs: p=0.04, alpha=0.01
        assert binomial_edit_threshold(3) == 1
        assert binomial_edit_threshold(7) == 2
        assert binomial_edit_threshold(1) <= 1
