"""Stage-1 device-kernel phase A/B on the real chip.

Builds (or loads from /tmp) the bench corpus, routes the bench queries
that the pipeline would send to the DEVICE path (non-tier), and times
`DeviceIndex.search_batch` under the phase-split knobs:

  full            stable top-k + LIM (serving configuration)
  plain_topk      lax.top_k only (drops the boundary-tie second pass)
  no_lim          drops the LIM block AND its cnt scatter
  minimal         both off: lane scatter + one top_k

The knobs are module globals read at trace time, so each variant flips
them and clears the jit cache; the persistent compile cache makes
repeat runs cheap. Usage: python scripts/s1_device_ab.py [n_docs] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

bench._setup_cache()

import numpy as np
import jax

from infidex_tpu import Document, Query, SearchEngine

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
IDX = f"/tmp/idx_lab_{N}.bin"


def build_or_load():
    jax.devices()
    if os.path.exists(IDX):
        t0 = time.perf_counter()
        eng = SearchEngine.load(IDX)
        print(f"loaded {IDX} in {time.perf_counter()-t0:.1f}s", flush=True)
    else:
        eng = SearchEngine.create_default()
        titles = bench.make_corpus(N)
        t0 = time.perf_counter()
        eng.index_documents([Document(i, t) for i, t in enumerate(titles)])
        print(f"indexed in {time.perf_counter()-t0:.1f}s", flush=True)
        eng.save(IDX)
    return eng


def main():
    eng = build_or_load()
    model = eng._vector_model
    if model.built is None:
        model.build_inverted_lists()
    if model.device is None:
        from infidex_tpu.index.device import DeviceIndex
        model.device = DeviceIndex(model.built)
    dev = model.device

    titles = bench.make_corpus(N)
    queries = bench.make_queries(titles, 256)
    # device-routed preps, exactly the pipeline's split
    preps = []
    for q in queries:
        prep = model.prepare_stage1(q)
        if prep is not None and not model._tier_gate(prep):
            preps.append(prep)
    batch = preps[:27]
    print(f"{len(preps)} device-routed; timing batch of {len(batch)}",
          flush=True)

    from infidex_tpu.index import device as D

    variants = [
        ("full", False, False),
        ("plain_topk", True, False),
        ("no_lim", False, True),
        ("minimal", True, True),
    ]
    for name, plain, nolim in variants:
        D._S1_PLAIN_TOPK = plain
        D._S1_NO_LIM = nolim
        jax.clear_caches()
        t0 = time.perf_counter()
        dev.search_batch(batch, 500)     # compile + warm
        warm = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            dev.search_batch(batch, 500)
            times.append((time.perf_counter() - t0) * 1000)
        times.sort()
        print(f"{name:>11}: p50 {times[len(times)//2]:7.1f}ms "
              f"min {times[0]:7.1f}ms (warm {warm:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
