"""Measure per-stage HOST time of batched search from the [PIPE] trace.

Host stages (s1-prep, s1-tier, gate+begin, finish, cov resolve/host) are
pure numpy — backend-independent — so their times measured on the CPU
backend transfer to the TPU serving picture, where post-pipelining QPS
is bounded by max(host_ms, device_ms) per batch. Device-stage marks
(s1-device, coverage collect) are meaningless on CPU and reported only
for completeness.

Usage: JAX_PLATFORMS=cpu python scripts/host_stage_lab.py [n_docs] [n_batches]
"""

import contextlib
import io
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["INFIDEX_TPU_TRACE"] = "1"

import bench

bench._setup_cache()
from infidex_tpu import Document, Query, SearchEngine

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
N_BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 6
BATCH = 64

MARK = re.compile(r"\[PIPE\] ( *[\w+-]+): ([\d.]+)ms")
DETAIL = re.compile(r"\[PIPE\]   (gate|cov)-detail: (.*)")
KV = re.compile(r"(\w+)=([\d.]+)ms")


def main():
    t0 = time.perf_counter()
    titles = bench.make_corpus(N_DOCS)
    eng = SearchEngine.create_default()
    eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
    print(f"[lab] indexed {N_DOCS} in {time.perf_counter()-t0:.0f}s",
          flush=True)

    queries = bench.make_queries(titles, BATCH * (N_BATCHES + 1))
    chunks = [queries[i:i + BATCH] for i in range(0, len(queries), BATCH)]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eng.search_batch([Query(q, 10) for q in chunks[0]])   # warm
    print("[lab] warm", flush=True)

    profile = os.environ.get("LAB_PROFILE")
    prof = None
    if profile:
        import cProfile
        prof = cProfile.Profile()

    stage_ms = defaultdict(list)
    detail_ms = defaultdict(list)
    for c in chunks[1:]:
        buf = io.StringIO()
        t1 = time.perf_counter()
        if prof is not None:
            prof.enable()
        with contextlib.redirect_stdout(buf):
            eng.search_batch([Query(q, 10) for q in c])
        if prof is not None:
            prof.disable()
        wall = (time.perf_counter() - t1) * 1000
        stage_ms["TOTAL(cpu)"].append(wall)
        for line in buf.getvalue().splitlines():
            m = MARK.match(line)
            if m:
                stage_ms[m.group(1).strip()].append(float(m.group(2)))
            m = DETAIL.match(line)
            if m:
                for k, v in KV.findall(m.group(2)):
                    detail_ms[f"{m.group(1)}:{k}"].append(float(v))

    print(f"\n[lab] per-batch stage means over {N_BATCHES} batches "
          f"of {BATCH} @ {N_DOCS} docs (HOST stages transfer to TPU):")
    for k, v in sorted(stage_ms.items(), key=lambda kv: -sum(kv[1])):
        print(f"  {k:>14}: {sum(v)/len(v):8.1f}ms  (n={len(v)})")
    for k, v in sorted(detail_ms.items(), key=lambda kv: -sum(kv[1])):
        print(f"  {k:>14}: {sum(v)/len(v):8.1f}ms  (n={len(v)})")

    if prof is not None:
        import pstats
        st = pstats.Stats(prof)
        st.sort_stats("cumulative")
        print("\n[lab] callees of the gate+begin subtree:")
        st.print_callees("_coverage_begin_fast")
        st.print_callees("_assemble_prior")
        st.print_callees("class_prior")
        st.print_callees("_resolve_candidates_fast")


if __name__ == "__main__":
    main()
