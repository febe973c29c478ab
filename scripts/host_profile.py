"""Profile the HOST-side Python cost of batched search.

The tunneled-TPU trace showed ~400ms host + ~350ms device per 64-query
batch at 1M docs; with 2-worker cross-batch overlap the throughput
ceiling is max(host, device), so host Python time is the lever that is
measurable WITHOUT the tunnel (it is backend-independent).

On the CPU backend the "device" calls burn the same core, so this
script reports two views:
  * cProfile cumulative time grouped by infidex_tpu module/function
    (jax-internal frames separated out), over N_BATCHES batches.
  * a tottime top-list restricted to our own code.

Usage: JAX_PLATFORMS=cpu python scripts/host_profile.py [n_docs] [n_batches]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()
from infidex_tpu import Document, Query, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 8
BATCH = 64


def main():
    t0 = time.perf_counter()
    titles = bench.make_corpus(N_DOCS)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    print(f"[prof] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s",
          flush=True)

    queries = bench.make_queries(titles, BATCH * (N_BATCHES + 2))
    chunks = [queries[i:i + BATCH] for i in range(0, len(queries), BATCH)]
    for c in chunks[:2]:          # warm every bucket
        eng.search_batch([Query(q, 10) for q in c])
    work = chunks[2:]
    print("[prof] warm", flush=True)

    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.enable()
    for c in work:
        eng.search_batch([Query(q, 10) for q in c])
    prof.disable()
    wall = time.perf_counter() - t0
    print(f"[prof] {len(work)} batches in {wall:.2f}s "
          f"({wall/len(work)*1000:.0f}ms/batch, "
          f"{len(work)*BATCH/wall:.1f} qps CPU-backend)", flush=True)

    s = io.StringIO()
    st = pstats.Stats(prof, stream=s)
    st.sort_stats("cumulative")
    st.print_stats("infidex_tpu", 45)
    print(s.getvalue())

    s = io.StringIO()
    st = pstats.Stats(prof, stream=s)
    st.sort_stats("tottime")
    st.print_stats("infidex_tpu|bench", 35)
    print(s.getvalue())

    # jax-side total for scale: tottime of everything NOT ours.
    st = pstats.Stats(prof)
    ours = jaxt = other = 0.0
    for (fn, _ln, _name), (cc, nc, tt, ct, callers) in st.stats.items():
        if "infidex_tpu" in fn or fn.endswith("bench.py"):
            ours += tt
        elif "jax" in fn or "xla" in fn.lower():
            jaxt += tt
        else:
            other += tt
    print(f"[prof] tottime split: ours={ours:.2f}s jax={jaxt:.2f}s "
          f"other={other:.2f}s (wall {wall:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
