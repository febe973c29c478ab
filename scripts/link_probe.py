"""Probe the tunneled device link: per-call and per-argument costs.

Answers, with measurements, the questions that decide dispatch design:
  1. What does ONE tiny transfer (host->device) cost?
  2. Do N small argument transfers cost N round trips, or one?
  3. What does a jitted call with 12 small args cost vs 2 packed args?
  4. What does a readback of a small vs large output cost?
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/infidex_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def t(fn, n=5):
    fn()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append((time.perf_counter() - t0) * 1000)
    samples.sort()
    return samples[len(samples) // 2]


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    small = [np.arange(256, dtype=np.int32) + i for i in range(12)]
    big = np.arange(1 << 20, dtype=np.int32)

    # 1. one tiny transfer + readback
    def one_rt():
        x = jnp.asarray(small[0])
        np.asarray(x)
    print(f"tiny transfer+readback: {t(one_rt):.1f}ms", flush=True)

    # 2. 12 transfers then one readback of the last
    def twelve():
        hs = [jnp.asarray(a) for a in small]
        np.asarray(hs[-1])
    print(f"12 tiny transfers (+1 readback): {t(twelve):.1f}ms", flush=True)

    # 2b. one packed transfer of same data
    packed = np.concatenate(small)

    def one_packed():
        h = jnp.asarray(packed)
        np.asarray(h[-1:])
    print(f"1 packed transfer (+1 readback): {t(one_packed):.1f}ms",
          flush=True)

    # 3. jitted call with 12 args vs 2 args (numpy inputs each time)
    @jax.jit
    def f12(*xs):
        s = xs[0].astype(jnp.float32)
        for x in xs[1:]:
            s = s + x.astype(jnp.float32)
        return s.sum()

    @jax.jit
    def f1(x):
        return x.astype(jnp.float32).sum()

    def call12():
        np.asarray(f12(*small))
    def call1():
        np.asarray(f1(packed))
    print(f"jit call, 12 numpy args: {t(call12):.1f}ms", flush=True)
    print(f"jit call, 1 packed numpy arg: {t(call1):.1f}ms", flush=True)

    # 3b. same but args already on device
    dsmall = [jnp.asarray(a) for a in small]
    dpacked = jnp.asarray(packed)
    jax.block_until_ready(dsmall); jax.block_until_ready(dpacked)
    def call12_dev():
        np.asarray(f12(*dsmall))
    def call1_dev():
        np.asarray(f1(dpacked))
    print(f"jit call, 12 device args: {t(call12_dev):.1f}ms", flush=True)
    print(f"jit call, 1 device arg: {t(call1_dev):.1f}ms", flush=True)

    # 4. large transfer and readback
    def big_up():
        jax.block_until_ready(jnp.asarray(big))
    print(f"4MB transfer: {t(big_up):.1f}ms", flush=True)
    dbig = jnp.asarray(big)
    jax.block_until_ready(dbig)
    def big_down():
        np.asarray(dbig)
    print(f"4MB readback: {t(big_down):.1f}ms", flush=True)

    # 5. two INDEPENDENT jit calls dispatched back to back, then both read
    def two_calls():
        a = f1(packed)
        b = f1(packed)
        np.asarray(a); np.asarray(b)
    print(f"2 jit calls + 2 readbacks: {t(two_calls):.1f}ms", flush=True)


if __name__ == "__main__":
    main()
