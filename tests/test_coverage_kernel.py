"""Device coverage+fusion kernel == host oracle (the parity crown jewel).

Random word-soup corpora and queries (exact words, typos, prefixes, joins)
are scored by both the batched kernel and the per-candidate oracle; final
(score, tiebreaker, word_hits) must agree.
"""

import random

import numpy as np
import pytest

from infidex_tpu.coverage.engine import CoverageEngine
from infidex_tpu.coverage.setup import CoverageSetup
from infidex_tpu.index.vector_model import DocumentMetadata
from infidex_tpu.ops.coverage_kernel import (CoverageConfig, CoverageTables,
                                             D_MAX, FQ_MAX, L_MAX, Q_MAX,
                                             coverage_fusion_batch,
                                             encode_query_tokens)
from infidex_tpu.scoring.fusion import fusion_calculate
from infidex_tpu.scoring.segment_processor import calculate_lcs
from infidex_tpu.tokenization.normalizer import TextNormalizer
from infidex_tpu.tokenization.tokenizer import Tokenizer, TokenizerSetup
from infidex_tpu.utils.metrics import lcs as lcs_metric

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
         "redemption", "shawshank", "star", "wars", "trek", "the", "of",
         "new", "york", "newyork", "a", "b", "x1"]


def make_tokenizer():
    return Tokenizer([3], 2, 0, TextNormalizer.create_default(),
                     TokenizerSetup())


def make_corpus(rng, n):
    texts = []
    for _ in range(n):
        k = rng.randint(1, 7)
        words = [rng.choice(WORDS) for _ in range(k)]
        sep = rng.choice([" ", " ", " ", "-", ", "])
        texts.append(sep.join(words))
    texts.append("")  # empty doc
    texts.append("single")
    return texts


def perturb(rng, word):
    if len(word) < 3:
        return word
    mode = rng.randint(0, 3)
    i = rng.randrange(1, len(word) - 1)
    if mode == 0:
        return word[:i] + word[i + 1:]                       # deletion
    if mode == 1:
        return word[:i] + rng.choice("abcdefgh") + word[i:]  # insertion
    if mode == 2:
        return word[:i] + word[i + 1] + word[i] + word[i + 2:]  # swap
    return word[:i] + rng.choice("abcdefgh") + word[i + 1:]  # substitution


def make_queries(rng, n):
    queries = []
    for _ in range(n):
        mode = rng.randint(0, 6)
        if mode == 0:
            queries.append(rng.choice(WORDS))
        elif mode == 1:
            queries.append(perturb(rng, rng.choice(WORDS)))
        elif mode == 2:
            queries.append(f"{rng.choice(WORDS)} {rng.choice(WORDS)}")
        elif mode == 3:
            w = rng.choice(WORDS)
            queries.append(f"{rng.choice(WORDS)} {w[:max(2, len(w)-2)]}")
        elif mode == 4:
            queries.append(f"{rng.choice(WORDS)} {perturb(rng, rng.choice(WORDS))} {rng.choice(WORDS)}")
        elif mode == 5:
            queries.append(f"{rng.choice(WORDS)} a")  # single-char last token
        else:
            queries.append("new york")
    return queries


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_kernel_matches_oracle(seed):
    rng = random.Random(seed)
    tokenizer = make_tokenizer()
    setup = CoverageSetup.create_default()
    engine = CoverageEngine(tokenizer, setup)

    texts = make_corpus(rng, 30)
    lower_texts = [t.lower() for t in texts]
    word_idf = {w: round(rng.uniform(0.1, 3.0), 3) for w in WORDS}
    engine.set_word_idf_cache(word_idf)
    metadata = []
    delims = tokenizer.tokenizer_setup.delimiter_set
    for t in lower_texts:
        toks = [w for w in _split(t, delims)]
        metadata.append(DocumentMetadata(toks[0] if toks else "", len(toks)))
    engine.set_document_metadata_cache(metadata)

    tables = CoverageTables.build(lower_texts, delims)
    config = CoverageConfig.from_setup(setup)
    C = len(texts)

    mismatches = []
    for query in make_queries(rng, 12):
        query = query.lower()
        context = engine.prepare_query(query)
        if context.q_count == 0 or context.q_count > Q_MAX:
            continue

        # Host oracle per candidate
        oracle = []
        lcs_vals = np.zeros(C, np.float32)
        base = np.array([rng.random() for _ in range(C)], np.float32)
        for i, text in enumerate(texts):
            tolerance = 0
            if len(query) >= setup.coverage_q_limit_for_error_tolerance:
                tolerance = int(len(query) *
                                setup.coverage_lcs_error_tolerance_relative_q)
            lcs_vals[i] = calculate_lcs(query, text, tolerance)
            features = engine.calculate_features(context, text, lcs_vals[i], i)
            score, tie = fusion_calculate(query, text, features, float(base[i]), 3)
            oracle.append((score, tie, features.word_hits))

        # Device kernel
        q_chars, q_rev, q_lens, _, q_count, q_ovf = encode_query_tokens(
            context.query_tokens, Q_MAX)
        from infidex_tpu.coverage.engine import tokenize_slices
        fusion_tokens = tokenize_slices(query, 0, delims)
        fq_chars, fq_rev, fq_lens, _, fq_count, fq_ovf = encode_query_tokens(
            fusion_tokens, FQ_MAX)
        if q_ovf or fq_ovf:
            continue
        order = sorted(range(q_count), key=lambda i: -q_lens[i])
        q_sorted = np.zeros(Q_MAX, np.int32)
        q_sorted[: len(order)] = order
        q_sorted[len(order):] = q_count  # out-of-range -> masked
        q_idf = np.zeros(Q_MAX, np.float32)
        q_idf[:q_count] = context.term_idf[:q_count]
        q_widf = np.zeros(Q_MAX, np.float32)
        q_widf[:q_count] = (context.word_level_idf or [0.0] * q_count)[:q_count]
        last_alpha = bool(fusion_tokens and len(fusion_tokens[-1].lower) == 1
                          and fusion_tokens[-1].lower.isalpha())

        score, tie, wh = coverage_fusion_batch(
            tables.word_chars, tables.word_chars_rev, tables.word_lens,
            tables.doc_tokens, tables.doc_tok_offsets, tables.doc_tok_count,
            tables.doc_adj_ws, tables.doc_text_len,
            np.arange(C, dtype=np.int32),
            q_chars, q_rev, q_lens, q_idf, q_widf, np.int32(q_count),
            q_sorted, fq_chars, fq_rev, fq_lens, np.int32(fq_count),
            np.bool_(last_alpha),
            lcs_vals, base, np.int32(len(query)),
            config=config)
        score = np.asarray(score)
        tie = np.asarray(tie)
        wh = np.asarray(wh)

        for i in range(C):
            if tables.overflow[i]:
                continue
            o_score, o_tie, o_wh = oracle[i]
            if (abs(score[i] - o_score) > 1e-3 or tie[i] != o_tie
                    or wh[i] != o_wh):
                mismatches.append(
                    (query, texts[i],
                     (float(score[i]), int(tie[i]), int(wh[i])),
                     (o_score, o_tie, o_wh)))

    assert not mismatches, "\n".join(repr(m) for m in mismatches[:12])


def _split(text, delims):
    out, cur = [], []
    for ch in text:
        if ch in delims:
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
