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

        packed = np.asarray(coverage_fusion_batch(
            tables.word_chars, tables.word_chars_rev, tables.word_lens,
            tables.doc_tokens, tables.doc_tok_offsets, tables.doc_tok_count,
            tables.doc_adj_ws, tables.doc_text_len,
            np.arange(C, dtype=np.int32), np.zeros(C, np.int32),
            q_chars[None], q_rev[None], q_lens[None], q_idf[None],
            q_widf[None], np.array([q_count], np.int32), q_sorted[None],
            fq_chars[None], fq_rev[None], fq_lens[None],
            np.array([fq_count], np.int32), np.array([last_alpha], np.bool_),
            lcs_vals, base, np.array([len(query)], np.int32),
            config=config))
        score, tie, wh = packed[0], packed[1], packed[2]

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


def _encode_query(engine, query, delims):
    """Encode one query into the kernel's per-query arrays, or None."""
    from infidex_tpu.coverage.engine import tokenize_slices

    context = engine.prepare_query(query)
    if context.q_count == 0 or context.q_count > Q_MAX:
        return None
    q_chars, q_rev, q_lens, _, q_count, q_ovf = encode_query_tokens(
        context.query_tokens, Q_MAX)
    fusion_tokens = tokenize_slices(query, 0, delims)
    fq_chars, fq_rev, fq_lens, _, fq_count, fq_ovf = encode_query_tokens(
        fusion_tokens, FQ_MAX)
    if q_ovf or fq_ovf:
        return None
    order = sorted(range(q_count), key=lambda i: -q_lens[i])
    q_sorted = np.full(Q_MAX, q_count, dtype=np.int32)
    q_sorted[: len(order)] = order
    q_idf = np.zeros(Q_MAX, np.float32)
    q_idf[:q_count] = context.term_idf[:q_count]
    q_widf = np.zeros(Q_MAX, np.float32)
    q_widf[:q_count] = (context.word_level_idf or [0.0] * q_count)[:q_count]
    last_alpha = bool(fusion_tokens and len(fusion_tokens[-1].lower) == 1
                      and fusion_tokens[-1].lower.isalpha())
    return dict(q_chars=q_chars, q_rev=q_rev, q_lens=q_lens, q_idf=q_idf,
                q_widf=q_widf, q_count=q_count, q_sorted=q_sorted,
                fq_chars=fq_chars, fq_rev=fq_rev, fq_lens=fq_lens,
                fq_count=fq_count, last_alpha=last_alpha,
                query_len=len(query))


def _run_kernel(tables, config, text_ids, qsel, encs, lcs_vals, base):
    """Stack B encoded queries and run one kernel call."""
    stk = lambda k: np.stack([e[k] for e in encs])
    vec = lambda k, dt: np.array([e[k] for e in encs], dt)
    return coverage_fusion_batch(
        tables.word_chars, tables.word_chars_rev, tables.word_lens,
        tables.doc_tokens, tables.doc_tok_offsets, tables.doc_tok_count,
        tables.doc_adj_ws, tables.doc_text_len,
        text_ids.astype(np.int32), qsel.astype(np.int32),
        stk("q_chars"), stk("q_rev"), stk("q_lens"), stk("q_idf"),
        stk("q_widf"), vec("q_count", np.int32), stk("q_sorted"),
        stk("fq_chars"), stk("fq_rev"), stk("fq_lens"),
        vec("fq_count", np.int32), vec("last_alpha", np.bool_),
        lcs_vals.astype(np.float32), base.astype(np.float32),
        vec("query_len", np.int32), config=config)


def test_multi_query_batch_matches_per_query():
    """Candidates of B different queries scored in ONE kernel call must
    equal B separate single-query calls (the search_batch contract)."""
    rng = random.Random(7)
    tokenizer = make_tokenizer()
    setup = CoverageSetup.create_default()
    engine = CoverageEngine(tokenizer, setup)

    texts = make_corpus(rng, 24)
    lower_texts = [t.lower() for t in texts]
    word_idf = {w: round(rng.uniform(0.1, 3.0), 3) for w in WORDS}
    engine.set_word_idf_cache(word_idf)
    delims = tokenizer.tokenizer_setup.delimiter_set
    metadata = []
    for t in lower_texts:
        toks = [w for w in _split(t, delims)]
        metadata.append(DocumentMetadata(toks[0] if toks else "", len(toks)))
    engine.set_document_metadata_cache(metadata)

    tables = CoverageTables.build(lower_texts, delims)
    config = CoverageConfig.from_setup(setup)
    C = len(texts)

    queries = ["shawshank redemption", "teh godfther", "star a",
               "new york", "alpha brvo charlie"]
    encs = [_encode_query(engine, q, delims) for q in queries]
    encs = [e for e in encs if e is not None]
    assert len(encs) >= 3
    B = len(encs)

    lcs_vals = np.zeros(C, np.float32)
    base = np.array([rng.random() for _ in range(C)], np.float32)

    # Per-query calls (B=1, qsel=0)
    singles = []
    ids = np.arange(C, dtype=np.int32)
    for e in encs:
        out = np.asarray(_run_kernel(tables, config, ids, np.zeros(C), [e],
                                     lcs_vals, base))
        singles.append([out[0], out[1], out[2]])

    # One batched call: candidates of all queries interleaved (stress qsel)
    text_ids = np.concatenate([ids] * B)
    qsel = np.repeat(np.arange(B), C)
    perm = np.random.RandomState(0).permutation(B * C)
    out = np.asarray(_run_kernel(tables, config, text_ids[perm], qsel[perm],
                                 encs, np.tile(lcs_vals, B)[perm],
                                 np.tile(base, B)[perm]))
    score, tie, wh = out[0], out[1], out[2]

    for pos, orig in enumerate(perm):
        b, i = orig // C, orig % C
        s1, t1, w1 = (singles[b][0][i], singles[b][1][i], singles[b][2][i])
        assert abs(float(score[pos]) - float(s1)) <= 1e-5, \
            (queries[b], texts[i], float(score[pos]), float(s1))
        assert int(tie[pos]) == int(t1)
        assert int(wh[pos]) == int(w1)
