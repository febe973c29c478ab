"""Run BASELINE configs 1/3/4/5 + the mmap A/B in ONE process.

The flappy tunnel makes every fresh bench process a fresh roll of the
backend-init dice (a passed probe does not stop the REAL init from
hanging — observed 09:55-10:35 2026-08-20). One process = one init =
one gauntlet run; each config then reuses the live backend.

Usage: python scripts/r5_configs_once.py [n_docs] [n_queries]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    bench._setup_cache()
    import jax

    t0 = time.perf_counter()
    jax.devices()
    log(f"[configs] backend up in {time.perf_counter()-t0:.0f}s")

    for name in ("exact", "multifield", "filters", "incremental"):
        fn = bench.MODES[name]
        t = time.perf_counter()
        try:
            fn(n_docs=N_DOCS, n_queries=N_QUERIES)
        except Exception as e:  # keep the remaining configs alive
            log(f"[configs] {name} FAILED: {e!r}")
        log(f"[configs] {name} done in {time.perf_counter()-t:.0f}s")

    # mmap serving A/B at 300k, same live backend (VERDICT r4 #6a)
    import runpy

    t = time.perf_counter()
    try:
        sys.argv = ["mmap_ab.py", "300000", "192"]
        runpy.run_path(os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "mmap_ab.py"), run_name="__main__")
    except Exception as e:
        log(f"[configs] mmap_ab FAILED: {e!r}")
    log(f"[configs] mmap_ab done in {time.perf_counter()-t:.0f}s")


if __name__ == "__main__":
    main()
