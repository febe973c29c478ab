"""Probe: lax.top_k vs lax.approx_max_k(recall_target=1.0) on the chip.

The Stage-1 kernel pays three [B, N] top-k passes per call (score top-k,
boundary-tie low-id fill, LIM low-id rows) — measured ~150ms of a 246ms
kernel at N=524288, B=32, k=512. TPU's PartialReduce (approx_max_k) is
the hardware-shaped alternative; at recall_target=1.0 XLA sizes the
reduction for exactness. This probe checks value-exactness on a
tie-heavy BM25-like distribution and times both.
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

B, N, K = 32, 524288, 512
rng = np.random.default_rng(0)
# BM25-ish: sparse positives with heavy f32 tie classes
x = np.zeros((B, N), np.float32)
for b in range(B):
    nz = rng.choice(N, 80_000, replace=False)
    x[b, nz] = rng.choice(np.linspace(0.5, 12.0, 64).astype(np.float32),
                          nz.size)
xd = jnp.asarray(x)

exact = jax.jit(lambda v: jax.lax.top_k(v, K))
apx = jax.jit(lambda v: jax.lax.approx_max_k(v, K, recall_target=1.0))
apx95 = jax.jit(lambda v: jax.lax.approx_max_k(v, K, recall_target=0.95))


def timeit(f, v):
    r = f(v)
    jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(v))
        ts.append((time.perf_counter() - t0) * 1000)
    ts.sort()
    return r, ts[len(ts) // 2]


(ev, ei), t_e = timeit(exact, xd)
(av, ai), t_a = timeit(apx, xd)
(_, _), t_a95 = timeit(apx95, xd)
print(f"lax.top_k:            {t_e:7.1f}ms")
print(f"approx_max_k r=1.0:   {t_a:7.1f}ms  values_equal={bool(jnp.array_equal(ev, av))}")
print(f"approx_max_k r=0.95:  {t_a95:7.1f}ms")

# int32 low-id pattern (the stable/LIM passes): min-k over int keys
key = np.where(x > 3.0, np.arange(N, dtype=np.int32)[None, :], 1 << 24)
kd = jnp.asarray(key)
exact_i = jax.jit(lambda v: jax.lax.top_k(-v, K))
apx_i = jax.jit(lambda v: jax.lax.approx_min_k(
    v.astype(jnp.float32), K, recall_target=1.0))
(eiv, _), t_ei = timeit(exact_i, kd)
(aiv, _), t_ai = timeit(apx_i, kd)
ok = bool(jnp.array_equal(-eiv.astype(jnp.float32), aiv))
print(f"int top_k(-key):      {t_ei:7.1f}ms")
print(f"approx_min_k f32:     {t_ai:7.1f}ms  values_equal={ok}")
