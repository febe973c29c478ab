"""Micro-profile of Stage-1 kernel components on the real TPU.

Times each sub-operation of the batched Stage-1 kernel at 10k and 1M doc
scale to locate the bottleneck (XLA scatter? gather? top_k?) and compares
candidate reformulations (sort+segment-sum, block-compacted scatter).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000  # ms


def bench_scale(n_docs, n_q, lanes_per_q, k=500):
    print(f"\n=== N={n_docs:,} B={n_q} lanes/q={lanes_per_q:,} ===")
    rng = np.random.default_rng(0)
    L = n_q * lanes_per_q
    n_pad = n_docs
    doc = rng.integers(0, n_docs, L).astype(np.int32)
    doc.sort()  # postings are doc-sorted per term; global sort approximates runs
    contrib = rng.random(L).astype(np.float32)
    qof = np.repeat(np.arange(n_q, dtype=np.int32), lanes_per_q)
    flat = (qof.astype(np.int64) * n_pad + doc).astype(np.int32) if n_q * n_pad < 2**31 else None

    jdoc = jnp.asarray(doc)
    jcontrib = jnp.asarray(contrib)
    jqof = jnp.asarray(qof)
    jflat = jnp.asarray(qof * n_pad + doc)

    dl = jnp.asarray(rng.random(n_pad).astype(np.float32) + 0.5)

    # 1. pure gather: doc_lengths[doc]
    f_gather = jax.jit(lambda d: dl[d].sum())
    print(f"  gather dl[doc] [{L:,}]:        {timeit(f_gather, jdoc):8.2f} ms")

    # 2. scatter-add into [B*N]
    @jax.jit
    def f_scatter(fl, c):
        return jnp.zeros((n_q * n_pad,), jnp.float32).at[fl].add(c, mode="drop")
    print(f"  scatter-add [{L:,}]->[{n_q*n_pad:,}]: {timeit(f_scatter, jflat, jcontrib):8.2f} ms")

    # 3. top_k over [B, N] k=500
    scores = jnp.asarray(rng.random((n_q, n_pad)).astype(np.float32))
    f_topk = jax.jit(lambda s: jax.lax.top_k(s, k))
    print(f"  top_k k={k} [{n_q},{n_pad:,}]:    {timeit(f_topk, scores):8.2f} ms")

    # 4. sort lanes by flat key + segment-sum (reformulation A)
    @jax.jit
    def f_sortseg(fl, c):
        sk, sc = jax.lax.sort((fl, c), num_keys=1)
        # segment boundaries
        newseg = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
        segsum = jnp.cumsum(sc)
        return sk, newseg, segsum
    print(f"  sort+scan [{L:,}]:             {timeit(f_sortseg, jflat, jcontrib):8.2f} ms")

    # 5. argsort-free per-query scatter via one-hot matmul over 128-doc tiles
    #    (skipped: metadata blowup) -- instead measure scatter into compacted
    #    candidate space 1/16 the size
    cand = max(n_pad // 16, 1024)
    jflat_c = jnp.asarray((qof * cand + (doc % cand)).astype(np.int32))
    @jax.jit
    def f_scatter_c(fl, c):
        return jnp.zeros((n_q * cand,), jnp.float32).at[fl].add(c, mode="drop")
    print(f"  scatter-add [{L:,}]->[{n_q*cand:,}]: {timeit(f_scatter_c, jflat_c, jcontrib):8.2f} ms")

    # 6. fused current-kernel shape: gather+compute+scatter+topk
    @jax.jit
    def f_full(d, c, fl):
        dlv = dl[d]
        contrib2 = c * (1.2 * (0.25 + 0.75 * dlv))
        s = jnp.zeros((n_q * n_pad,), jnp.float32).at[fl].add(contrib2, mode="drop")
        return jax.lax.top_k(s.reshape(n_q, n_pad), k)
    print(f"  full fused:                    {timeit(f_full, jdoc, jcontrib, jflat):8.2f} ms")


bench_scale(16 * 1024, 64, 10_000)
bench_scale(1024 * 1024, 16, 1_000_000, k=500)
