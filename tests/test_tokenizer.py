"""Tokenizer + normalizer behavior (reference: Tokenization/*, TokenizerTests.cs)."""

from infidex_tpu import TextNormalizer, Tokenizer, TokenizerSetup
from infidex_tpu.tokenization.tokenizer import START_PAD_CHAR


def make_tokenizer(index_sizes=(3,), start_pad=2, high_res=False):
    return Tokenizer(
        list(index_sizes), start_pad, 0,
        TextNormalizer.create_default(),
        TokenizerSetup(high_resolution_mode=high_res),
    )


class TestNormalizer:
    def test_diacritics_removed(self):
        n = TextNormalizer.create_default()
        assert n.normalize("Škoda") == "Skoda"
        assert n.normalize("café") == "cafe"
        assert n.normalize("Größe") == "Grose"

    def test_whitespace_collapsed(self):
        n = TextNormalizer.create_default()
        assert n.normalize("a  b") == "a b"
        assert n.normalize("a\t\nb") == "a b"
        assert n.normalize("a    b") == "a b"

    def test_unchanged_text_identity(self):
        n = TextNormalizer.create_default()
        s = "plain text"
        assert n.normalize(s) == s

    def test_empty(self):
        n = TextNormalizer.create_default()
        assert n.normalize("") == ""


class TestIndexingTokenization:
    def test_trigrams_with_padding(self):
        t = make_tokenizer()
        tokens = t.tokenize_for_indexing("cat")
        texts = [tok for tok, _ in tokens]
        # padded: ￿￿cat -> ￿￿c, ￿ca, cat + word "cat"
        assert START_PAD_CHAR * 2 + "c" in texts
        assert START_PAD_CHAR + "ca" in texts
        assert "cat" in texts
        assert texts.count("cat") == 2  # trigram + whole word

    def test_positions(self):
        t = make_tokenizer()
        tokens = t.tokenize_for_indexing("cat")
        d = {}
        for tok, pos in tokens:
            d.setdefault(tok, []).append(pos)
        assert d[START_PAD_CHAR * 2 + "c"] == [0]
        assert 2 in d["cat"]  # trigram at padded offset 2

    def test_word_min_size_filter(self):
        t = make_tokenizer()
        tokens = [tok for tok, _ in t.tokenize_for_indexing("an ox cat")]
        assert "an" not in tokens  # words < min n-gram size dropped
        assert "cat" in tokens

    def test_segment_continuation_skips_start_pad(self):
        t = make_tokenizer()
        tokens = [tok for tok, _ in t.tokenize_for_indexing("cat", True)]
        assert all(START_PAD_CHAR not in tok for tok in tokens)

    def test_all_padding_grams_skipped(self):
        t = make_tokenizer(index_sizes=(2,))
        tokens = [tok for tok, _ in t.tokenize_for_indexing("x")]
        assert START_PAD_CHAR * 2 not in tokens

    def test_multi_size(self):
        t = make_tokenizer(index_sizes=(2, 3))
        texts = [tok for tok, _ in t.tokenize_for_indexing("ab")]
        assert START_PAD_CHAR + "a" in texts  # 2-gram
        assert "ab" in texts

    def test_short_text_only_smallest_size(self):
        # len(padded) <= index_sizes[0] => only the smallest size used
        t = Tokenizer([2, 3], 0, 0, None, TokenizerSetup())
        texts = [tok for tok, _ in t.tokenize_for_indexing("ab")]
        assert texts == ["ab", "ab"]  # 2-gram plus the word itself


class TestSearchTokenization:
    def test_words_then_shingles(self):
        t = make_tokenizer()
        tokens = t.tokenize_for_search("cat")
        assert tokens[0] == "cat"  # word first
        assert START_PAD_CHAR * 2 + "c" in tokens

    def test_high_resolution_mode_joins(self):
        t = make_tokenizer(high_res=True)
        tokens = t.tokenize_for_search("ab cd")
        assert "abcd" in tokens  # joined text emitted

    def test_delimiters(self):
        t = make_tokenizer()
        words = [w for w, _ in t.split_words("new-york/city")]
        assert words == ["new", "york", "city"]


class TestCoverageWordTokens:
    def test_unique_lowercase(self):
        t = make_tokenizer()
        words = t.word_tokens_for_coverage("The THE cat", 2)
        assert sorted(words) == ["cat", "the"]


def test_search_token_cache_opt_in():
    """TokenizerSetup.search_token_cache_size wires TokenCache into the
    search tokenization path (dormant in the reference; opt-in here)."""
    from infidex_tpu.tokenization.normalizer import TextNormalizer
    from infidex_tpu.tokenization.tokenizer import Tokenizer, TokenizerSetup

    setup = TokenizerSetup(search_token_cache_size=8)
    tok = Tokenizer([3], 2, 0, TextNormalizer.create_default(), setup)
    a = tok.tokenize_for_search("hello world")
    b = tok.tokenize_for_search("hello world")
    assert a == b
    assert tok.search_token_cache.hits == 1
    assert tok.search_token_cache.misses == 1
    # cached result is identical to an uncached tokenizer's
    plain = Tokenizer([3], 2, 0, TextNormalizer.create_default(),
                      TokenizerSetup())
    assert a == plain.tokenize_for_search("hello world")
    # default stays dormant
    assert plain.search_token_cache is None
