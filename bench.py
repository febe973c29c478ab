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

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 200
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 16
BASELINE_QPS = 1000.0  # provisional C#-engine estimate; see module docstring

ADJECTIVES = [
    "dark", "silent", "broken", "golden", "hidden", "lost", "final", "iron",
    "crimson", "frozen", "burning", "endless", "savage", "gentle", "wild",
]
NOUNS = [
    "knight", "redemption", "empire", "shadow", "river", "mountain", "storm",
    "garden", "promise", "journey", "kingdom", "harbor", "winter", "crown",
    "station", "shawshank", "galaxy", "horizon", "memory", "legacy",
]


def make_corpus(n):
    rng = random.Random(1234)
    titles = []
    for i in range(n):
        k = rng.randint(2, 4)
        words = [rng.choice(ADJECTIVES) if j % 2 == 0 else rng.choice(NOUNS)
                 for j in range(k)]
        titles.append(" ".join(words).title())
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


def main():
    from infidex_tpu import Document, Query, SearchEngine

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    titles = make_corpus(N_DOCS)
    engine = SearchEngine.create_default()

    t0 = time.perf_counter()
    engine.index_documents([Document(i, t) for i, t in enumerate(titles)])
    index_secs = time.perf_counter() - t0
    log(f"[bench] indexed {N_DOCS} docs in {index_secs:.1f}s")

    queries = make_queries(titles, N_QUERIES)

    # Warmup: one full unmeasured pass (JIT compile of every shape bucket
    # the workload hits; compiles are slow on tunneled TPUs).
    t0 = time.perf_counter()
    n_batches = (len(queries) + BATCH - 1) // BATCH
    for i in range(0, len(queries), BATCH):
        engine.search_batch([Query(q, 10) for q in queries[i : i + BATCH]])
        if (i // BATCH) % 4 == 0:
            log(f"[bench] warmup batch {i // BATCH + 1}/{n_batches} "
                f"({time.perf_counter() - t0:.0f}s)")
    log(f"[bench] warmup done in {time.perf_counter() - t0:.0f}s")

    # Serving-style throughput: requests arrive continuously and are served
    # in device batches of BATCH (the device serializes work, so batching —
    # not thread concurrency — is what scales QPS). Per-query latency is the
    # wall time of the batch that served it.
    latencies = []
    t0 = time.perf_counter()
    for i in range(0, len(queries), BATCH):
        chunk = queries[i : i + BATCH]
        t1 = time.perf_counter()
        engine.search_batch([Query(q, 10) for q in chunk])
        dt = time.perf_counter() - t1
        latencies.extend([dt] * len(chunk))
    wall = time.perf_counter() - t0

    qps = len(queries) / wall
    latencies.sort()
    p50 = latencies[len(latencies) // 2] * 1000.0

    print(json.dumps({
        "metric": f"fuzzy-query QPS ({N_DOCS} docs, batch={BATCH}, "
                  f"p50={p50:.1f}ms, index={index_secs:.1f}s)",
        "value": round(qps, 2),
        "unit": "qps",
        "vs_baseline": round(qps / BASELINE_QPS, 4),
    }))


if __name__ == "__main__":
    main()
