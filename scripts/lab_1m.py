"""1M-doc lab: build (or load) the bench engine, run traced batches,
aggregate the [PIPE] per-stage breakdown. Keeps a saved index at
/tmp/idx1m.bin so repeated experiments skip the 60s build.

Usage: python scripts/lab_1m.py [--rebuild] [n_batches]
"""

import os
import re
import sys
import time
import contextlib
import io

os.environ.setdefault("INFIDEX_TPU_TRACE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

bench._setup_cache()   # persistent XLA compile cache (TPU runs)
from infidex_tpu import Document, Query, SearchEngine  # noqa: E402

N = int(os.environ.get("LAB_N", "1000000"))
IDX = f"/tmp/idx_lab_{N}.bin"


def build_or_load():
    import jax
    jax.devices()
    if os.path.exists(IDX) and "--rebuild" not in sys.argv:
        t0 = time.perf_counter()
        engine = SearchEngine.load(IDX)
        print(f"[lab] loaded {IDX} in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
    else:
        engine = SearchEngine.create_default()
        titles = bench.make_corpus(N)
        t0 = time.perf_counter()
        engine.index_documents([Document(i, t) for i, t in enumerate(titles)])
        print(f"[lab] indexed in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        engine.save(IDX)
        print(f"[lab] saved in {time.perf_counter()-t0:.1f}s "
              f"({os.path.getsize(IDX)/1e6:.0f} MB)", file=sys.stderr, flush=True)
    return engine


def main():
    nums = [a for a in sys.argv[1:] if a.isdigit()]
    n_batches = int(nums[0]) if nums else 4
    engine = build_or_load()
    titles = bench.make_corpus(N)
    queries = bench.make_queries(titles, 64 * (n_batches + 1))

    # Full warmup pass over the exact measurement batches (compiles every
    # shape bucket), untraced.
    os.environ.pop("INFIDEX_TPU_TRACE", None)
    for bi in range(n_batches):
        qs = [Query(q, 10) for q in queries[bi * 64:(bi + 1) * 64]]
        t0 = time.perf_counter()
        engine.search_batch(qs)
        print(f"[lab] warmup batch {bi}: {(time.perf_counter()-t0)*1000:.0f}ms",
              file=sys.stderr, flush=True)
    os.environ["INFIDEX_TPU_TRACE"] = "1"

    stage_ms = {}
    batch_times = []
    for bi in range(n_batches):
        qs = [Query(q, 10) for q in queries[bi * 64:(bi + 1) * 64]]
        buf = io.StringIO()
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(buf):
            engine.search_batch(qs)
        dt = (time.perf_counter() - t0) * 1000
        batch_times.append(dt)
        for line in buf.getvalue().splitlines():
            m = re.findall(r"(\S+)=([0-9.]+)(ms|\b)", line)
            lead = re.match(r"\[PIPE\]\s+(\S+): ([0-9.]+)ms", line)
            if lead:
                stage_ms.setdefault(lead.group(1), []).append(float(lead.group(2)))
            for k, v, unit in m:
                stage_ms.setdefault(k if unit == "ms" else k + "#", []).append(float(v))

    print(f"\n[lab] {n_batches} batches of 64, mean "
          f"{sum(batch_times)/len(batch_times):.0f}ms/batch "
          f"({64*1000*len(batch_times)/sum(batch_times):.1f} QPS)")
    for k, vs in sorted(stage_ms.items(), key=lambda kv: -sum(kv[1])):
        print(f"  {k:18s} total={sum(vs):8.1f}ms  mean={sum(vs)/len(vs):7.1f}ms "
              f"n={len(vs)}")


if __name__ == "__main__":
    main()
