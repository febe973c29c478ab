"""Op-level cost probe of the Stage-1 kernel at REAL 1M-doc shapes.

Times each constituent op of _stage1_kernel_batch_chunked on the chip:
the lane scatter-adds, the fuzzy presence block, each top-k formulation
(exact, approx_max_k, hierarchical two-stage), and the elementwise tie
pass — so the kernel redesign is driven by measured numbers, not the
(wrong) 0.1ms PartialReduce note from the 524288-shape probe.

Usage: python scripts/s1_shape_probe.py [N] [B] [LANES]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

bench._setup_cache()

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 27
LANES = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
K = 500
NGRP, FPAD = 64, 65536

rng = np.random.default_rng(0)
print(f"N={N} B={B} LANES={LANES} K={K}", flush=True)

# BM25-like dense scores with heavy tie classes (~8% nonzero per row)
x = np.zeros((B, N), np.float32)
for b in range(B):
    nz = rng.choice(N, 80_000, replace=False)
    x[b, nz] = rng.choice(np.linspace(0.5, 12.0, 64).astype(np.float32),
                          nz.size)
xd = jnp.asarray(x)

flat_keys = jnp.asarray(
    rng.integers(0, B * N, LANES).astype(np.int32))
contrib = jnp.asarray(rng.random(LANES).astype(np.float32))
fz_keys = jnp.asarray(rng.integers(0, NGRP * N, FPAD).astype(np.int32))
wsum = jnp.asarray(rng.random((B, NGRP)).astype(np.float32))
doc_fac = jnp.asarray(rng.random(N).astype(np.float32))


def timeit(f, *a, reps=5):
    r = f(*a)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append((time.perf_counter() - t0) * 1000)
    ts.sort()
    return ts[len(ts) // 2]


def report(name, f, *a):
    try:
        print(f"{name:42s} {timeit(f, *a):9.1f}ms", flush=True)
    except Exception as e:  # pragma: no cover
        print(f"{name:42s} FAILED {type(e).__name__}: {e}", flush=True)


# --- scatters -----------------------------------------------------------
report("scatter-add lanes->[B*N]",
       jax.jit(lambda k, c: jnp.zeros((B * N,), jnp.float32)
               .at[k].add(c, mode="drop").sum()), flat_keys, contrib)
report("2x scatter-add (scores+cnt)",
       jax.jit(lambda k, c: (
           jnp.zeros((B * N,), jnp.float32).at[k].add(c, mode="drop").sum()
           + jnp.zeros((B * N,), jnp.float32)
           .at[k].add(jnp.where(c > 0, 1.0, 0.0), mode="drop").sum())),
       flat_keys, contrib)

# --- fuzzy block --------------------------------------------------------
def fuzzy(fk, ws, df_):
    pres = jnp.zeros((NGRP * N,), jnp.float32).at[fk].max(1.0, mode="drop")
    pres = pres.reshape(NGRP, N)
    dfv = pres.sum(axis=1)
    add = ws @ (pres * df_[None, :])
    cnt = (ws > 0.5).astype(jnp.float32) @ pres
    return add.sum() + cnt.sum() + dfv.sum()

report(f"fuzzy block (pres [{NGRP},{N}] + 2 matmul)",
       jax.jit(fuzzy), fz_keys, wsum, doc_fac)

# --- top-k formulations ---------------------------------------------------
report("lax.top_k [B,N] k=500",
       jax.jit(lambda v: jax.lax.top_k(v, K)), xd)
report("lax.top_k [B,N] k=64",
       jax.jit(lambda v: jax.lax.top_k(v, 64)), xd)
report("approx_max_k r=1.0 [B,N] k=500",
       jax.jit(lambda v: jax.lax.approx_max_k(v, K, recall_target=1.0)), xd)
report("approx_max_k r=0.95 [B,N] k=500",
       jax.jit(lambda v: jax.lax.approx_max_k(v, K, recall_target=0.95)), xd)


def hier(v):
    S = 32
    vb = v.reshape(B * S, N // S)
    ts, ti = jax.lax.top_k(vb, K)
    base = (jnp.arange(B * S, dtype=jnp.int32) % S * (N // S))
    ti = ti + base[:, None]
    ts2, p = jax.lax.top_k(ts.reshape(B, S * K), K)
    ids = jnp.take_along_axis(ti.reshape(B, S * K), p, axis=1)
    return ts2, ids

report("hierarchical top_k 32x blocks k=500", jax.jit(hier), xd)

# elementwise tie pass: keym build + masked min-k via approx
def tie_pass(v):
    ts, _ = jax.lax.top_k(v, K)
    sk = ts[:, K - 1: K]
    iota = jnp.arange(N, dtype=jnp.float32)
    keym = jnp.where(v == sk, iota[None, :], jnp.float32(1 << 24))
    return (-jax.lax.top_k(-keym, K)[0])

report("tie pass: topk + masked low-id topk", jax.jit(tie_pass), xd)


def tie_pass_apx(v):
    ts, _ = jax.lax.approx_max_k(v, K, recall_target=1.0)
    sk = ts[:, K - 1: K]
    iota = jnp.arange(N, dtype=jnp.float32)
    keym = jnp.where(v == sk, iota[None, :], jnp.float32(1 << 24))
    return jax.lax.approx_min_k(keym, K, recall_target=1.0)[0]

report("tie pass via approx_max/min_k", jax.jit(tie_pass_apx), xd)

# exactness check of approx_max_k r=1.0 vs top_k on the tie-heavy dist
ev, _ = jax.lax.top_k(xd, K)
av, _ = jax.lax.approx_max_k(xd, K, recall_target=1.0)
print("approx r=1.0 values == exact:",
      bool(jnp.array_equal(ev, jnp.sort(av, axis=1)[:, ::-1])), flush=True)

# reduction passes (threshold-style alternative)
report("count(v > t) reduction [B,N]",
       jax.jit(lambda v: (v > 3.0).sum(axis=1)), xd)
report("row max [B,N]",
       jax.jit(lambda v: v.max(axis=1)), xd)
