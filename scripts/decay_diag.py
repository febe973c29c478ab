"""Within-session QPS decay bisect (VERDICT r4 weak #2 / task #2).

bench qps_runs decayed monotonically across identical stream passes
(16.5 -> 9.2 -> 3.8 on the CPU fallback; 163 -> 156 -> 155 on TPU).
This runs N identical passes over the same engine + query stream and,
between passes, dumps every candidate accumulator: RSS, gc object
counts, jax live device buffers, memo-cache sizes, and the host/device
split — so whichever curve tracks the QPS curve names the cause.

Usage: JAX_PLATFORMS=cpu python scripts/decay_diag.py [n_docs] [n_q] [passes]
"""

import gc
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()
import jax

from infidex_tpu import Document, Query, SearchEngine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 128
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 8
BATCH = 64


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def live_buffers():
    try:
        return len(jax.live_arrays())
    except Exception:
        return -1


def cache_sizes(eng):
    out = {}
    try:
        vm = eng._vector_model
        wm = getattr(vm, "_word_matcher", None) or getattr(
            eng, "_word_matcher", None)
    except AttributeError:
        vm = wm = None
    for name, obj in [("vm", vm), ("wm", wm), ("eng", eng)]:
        if obj is None:
            continue
        for attr in dir(obj):
            if "cache" in attr or "memo" in attr:
                v = getattr(obj, attr, None)
                if hasattr(v, "__len__"):
                    out[f"{name}.{attr}"] = len(v)
    return out


titles = bench.make_corpus(N)
eng = SearchEngine.create_default()
t0 = time.perf_counter()
eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
print(f"[decay] indexed {N} in {time.perf_counter() - t0:.0f}s", flush=True)
queries = bench.make_queries(titles, NQ)

for p in range(PASSES):
    qs = [Query(q, 10) for q in queries]
    eng.serving_split()
    gc_before = gc.get_count()
    t0 = time.perf_counter()
    eng.search_many(qs, batch_size=BATCH)
    wall = time.perf_counter() - t0
    split = eng.serving_split()
    n_objs = len(gc.get_objects())
    print(
        f"[decay] pass {p + 1}: {NQ / wall:6.1f} QPS  wall={wall:.2f}s  "
        f"dev={split['device_wait_s']:.2f}s calls={split['device_calls']} "
        f"rss={rss_mb():.0f}MB bufs={live_buffers()} objs={n_objs} "
        f"gc={gc_before}",
        flush=True,
    )
    caches = cache_sizes(eng)
    if caches:
        print(f"[decay]   caches: {caches}", flush=True)
