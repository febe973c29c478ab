"""Op-level cost probe of the Stage-1 kernel at REAL 1M-doc shapes.

Times each constituent op of _stage1_kernel_batch_chunked on the chip:
the lane scatter-adds, the fuzzy presence block, each top-k formulation
(exact, approx_max_k, hierarchical two-stage), and the elementwise tie
pass.

MEASUREMENT NOTE: the axon tunnel memoizes identical executions (same
executable + same input buffers returns a cached result, ~0ms), so every
timed call must cycle DISTINCT device buffers. We pre-upload R variants
of each input and round-robin them; reported number is the median over
reps (first call per variant is warmup/compile).

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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
B = int(sys.argv[2]) if len(sys.argv) > 2 else 32
LANES = int(sys.argv[3]) if len(sys.argv) > 3 else 2_097_152
K = 500
NGRP, FPAD = 32, 65536
R = 4          # distinct input variants (defeats tunnel memoization)
REPS = 8

rng = np.random.default_rng(0)
print(f"N={N} B={B} LANES={LANES} K={K} NGRP={NGRP}", flush=True)

# BM25-like dense scores with heavy tie classes (~8% nonzero per row)
def mk_dense(seed):
    r = np.random.default_rng(seed)
    x = np.zeros((B, N), np.float32)
    for b in range(B):
        nz = r.choice(N, 80_000, replace=False)
        x[b, nz] = r.choice(np.linspace(0.5, 12.0, 64).astype(np.float32),
                            nz.size)
    return jnp.asarray(x)

xds = [mk_dense(s) for s in range(R)]
jax.block_until_ready(xds[-1])

flat_keys = [jnp.asarray(np.random.default_rng(s).integers(
    0, B * N, LANES).astype(np.int32)) for s in range(R)]
contrib = [jnp.asarray(np.random.default_rng(s + 100).random(
    LANES).astype(np.float32)) for s in range(R)]
fz_keys = [jnp.asarray(np.random.default_rng(s + 200).integers(
    0, NGRP * N, FPAD).astype(np.int32)) for s in range(R)]
wsum = [jnp.asarray(np.random.default_rng(s + 300).random(
    (B, NGRP)).astype(np.float32)) for s in range(R)]
doc_fac = [jnp.asarray(np.random.default_rng(s + 400).random(
    N).astype(np.float32)) for s in range(R)]
jax.block_until_ready(doc_fac[-1])


def timeit(f, argsets, reps=REPS):
    # NOTE: on the axon tunnel block_until_ready returns without waiting;
    # only device_get (readback) observes completion. All probe fns
    # return small arrays so the transfer itself is negligible.
    for a in argsets:                     # warm every variant
        jax.device_get(f(*a))
    ts = []
    for i in range(reps):
        a = argsets[i % len(argsets)]
        t0 = time.perf_counter()
        jax.device_get(f(*a))
        ts.append((time.perf_counter() - t0) * 1000)
    ts.sort()
    return ts[len(ts) // 2]


def report(name, f, argsets):
    try:
        print(f"{name:44s} {timeit(f, argsets):9.1f}ms", flush=True)
    except Exception as e:  # pragma: no cover
        print(f"{name:44s} FAILED {type(e).__name__}: {e}", flush=True)


# --- scatters -----------------------------------------------------------
report("scatter-add lanes->[B*N]",
       jax.jit(lambda k, c: jnp.zeros((B * N,), jnp.float32)
               .at[k].add(c, mode="drop")[:64]),
       [(flat_keys[i], contrib[i]) for i in range(R)])
report("2x scatter-add (scores+cnt)",
       jax.jit(lambda k, c: (
           jnp.zeros((B * N,), jnp.float32).at[k].add(c, mode="drop")[:64]
           + jnp.zeros((B * N,), jnp.float32)
           .at[k].add(jnp.where(c > 0, 1.0, 0.0), mode="drop")[:64])),
       [(flat_keys[i], contrib[i]) for i in range(R)])

# --- fuzzy block --------------------------------------------------------
def fuzzy(fk, ws, df_):
    pres = jnp.zeros((NGRP * N,), jnp.float32).at[fk].max(1.0, mode="drop")
    pres = pres.reshape(NGRP, N)
    dfv = pres.sum(axis=1)
    add = ws @ (pres * df_[None, :])
    cnt = (ws > 0.5).astype(jnp.float32) @ pres
    return add[:, :64] + cnt[:, :64] + dfv[None, :64 % NGRP + 1]

report(f"fuzzy block (pres [{NGRP},{N}] + 2 matmul)",
       jax.jit(lambda fk, ws, df_: fuzzy(fk, ws, df_).sum()),
       [(fz_keys[i], wsum[i], doc_fac[i]) for i in range(R)])

# --- top-k formulations ---------------------------------------------------
xargs = [(xds[i],) for i in range(R)]
report("lax.top_k [B,N] k=500",
       jax.jit(lambda v: jax.lax.top_k(v, K)), xargs)
report("lax.top_k [B,N] k=64",
       jax.jit(lambda v: jax.lax.top_k(v, 64)), xargs)
report("approx_max_k r=1.0 [B,N] k=500",
       jax.jit(lambda v: jax.lax.approx_max_k(v, K, recall_target=1.0)),
       xargs)
report("approx_max_k r=0.95 [B,N] k=500",
       jax.jit(lambda v: jax.lax.approx_max_k(v, K, recall_target=0.95)),
       xargs)


def hier(v, S):
    vb = v.reshape(B * S, N // S)
    ts, ti = jax.lax.top_k(vb, K)
    base = (jnp.arange(B * S, dtype=jnp.int32) % S * (N // S))
    ti = ti + base[:, None]
    ts2, p = jax.lax.top_k(ts.reshape(B, S * K), K)
    ids = jnp.take_along_axis(ti.reshape(B, S * K), p, axis=1)
    return ts2, ids

report("hierarchical top_k 16x blocks k=500",
       jax.jit(lambda v: hier(v, 16)), xargs)
report("hierarchical top_k 64x blocks k=500",
       jax.jit(lambda v: hier(v, 64)), xargs)

# elementwise tie pass: keym build + masked min-k
def tie_pass(v):
    ts, _ = jax.lax.top_k(v, K)
    sk = ts[:, K - 1: K]
    iota = jnp.arange(N, dtype=jnp.float32)
    keym = jnp.where(v == sk, iota[None, :], jnp.float32(1 << 24))
    return (-jax.lax.top_k(-keym, K)[0])

report("tie pass: topk + masked low-id topk", jax.jit(tie_pass), xargs)


def tie_pass_apx(v):
    ts, _ = jax.lax.approx_max_k(v, K, recall_target=1.0)
    sk = jax.lax.top_k(ts, K)[0][:, K - 1: K]
    iota = jnp.arange(N, dtype=jnp.float32)
    keym = jnp.where(v == sk, iota[None, :], jnp.float32(1 << 24))
    return jax.lax.approx_min_k(keym, K, recall_target=1.0)[0]

report("tie pass via approx_max/min_k", jax.jit(tie_pass_apx), xargs)

# exactness check of approx_max_k r=1.0 vs top_k on the tie-heavy dist
ev, _ = jax.lax.top_k(xds[0], K)
av, _ = jax.lax.approx_max_k(xds[0], K, recall_target=1.0)
print("approx r=1.0 values == exact:",
      bool(jnp.array_equal(ev, jnp.sort(av, axis=1)[:, ::-1])), flush=True)
hv, hi = hier(xds[0], 16)
print("hier 16x values == exact:", bool(jnp.array_equal(ev, hv)), flush=True)

# reduction passes (threshold-style alternative)
report("count(v > t) reduction [B,N]",
       jax.jit(lambda v: (v > 3.0).sum(axis=1)), xargs)
report("row max [B,N]",
       jax.jit(lambda v: v.max(axis=1)), xargs)
