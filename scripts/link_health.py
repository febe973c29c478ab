"""Tunnel link health probe: latency floor + bandwidth, one JSON line.

The axon tunnel degrades two ways that wreck serving measurements
independently: per-call LATENCY (healthy ~29ms floor) and BULK
BANDWIDTH (a 9s/batch device wait at 1M was a bandwidth collapse with
the floor only 1.4x off). Print both so measurement sessions can gate
on health instead of averaging garbage runs.

Usage: python scripts/link_health.py   (exit 0 healthy / 1 degraded)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOOR_HEALTHY_MS = float(os.environ.get("INFIDEX_TPU_HEALTH_FLOOR", "36"))
BW_HEALTHY_MBPS = float(os.environ.get("INFIDEX_TPU_HEALTH_BW", "60"))

import jax
import jax.numpy as jnp
import numpy as np

jax.devices()

# latency floor: median of 5 tiny round-trips, distinct buffers
# (the tunnel memoizes identical executions)
xs = [jnp.full((8,), float(i), jnp.float32) for i in range(6)]
np.asarray(xs[0] + 1)
lat = []
for x in xs[1:]:
    t = time.perf_counter()
    np.asarray(x + 1)
    lat.append((time.perf_counter() - t) * 1000.0)
lat.sort()
floor_ms = lat[len(lat) // 2]

# bandwidth: ship a 16MB array up, sum-reduce on device (tiny result),
# then read a fresh 16MB result back. Distinct values defeat caching.
N = 4 << 20
up_ms, down_ms = [], []
for i in range(3):
    h = np.full(N, float(i + 1), np.float32)
    t = time.perf_counter()
    d = jax.device_put(h)
    float(jnp.sum(d))       # force the upload to complete
    up_ms.append((time.perf_counter() - t) * 1000.0)
    t = time.perf_counter()
    np.asarray(d + np.float32(i))
    down_ms.append((time.perf_counter() - t) * 1000.0)
mb = N * 4 / 1e6
up = sorted(up_ms)[1]
down = sorted(down_ms)[1]
up_mbps = mb / (up / 1000.0)
down_mbps = mb / (down / 1000.0)

# work probe: a real compute program (batched matmul chain, tiny
# readback). Catches the third failure mode — program executions
# running ~20x slow with the floor and bandwidth near-normal (chip
# time-sharing / tunnel RPC throughput collapse, seen 2026-08-19:
# 8 QPS at 300k with a 26ms floor and normal single-query latency).
WORK_HEALTHY_MS = float(os.environ.get("INFIDEX_TPU_HEALTH_WORK", "120"))


@jax.jit
def _work(x):
    for _ in range(8):
        x = jnp.tanh(x @ x) + 0.1
    return jnp.sum(x)


ws = []
for i in range(4):
    x = jnp.full((2048, 2048), 0.01 + i * 1e-4, jnp.bfloat16)
    t = time.perf_counter()
    float(_work(x))
    ws.append((time.perf_counter() - t) * 1000.0)
work_ms = sorted(ws[1:])[1]   # median of the 3 post-compile runs

healthy = (floor_ms <= FLOOR_HEALTHY_MS
           and min(up_mbps, down_mbps) >= BW_HEALTHY_MBPS
           and work_ms <= WORK_HEALTHY_MS)
print(json.dumps(dict(
    floor_ms=round(floor_ms, 1), up_mbps=round(up_mbps, 1),
    down_mbps=round(down_mbps, 1), work_ms=round(work_ms, 1),
    healthy=healthy, backend=jax.default_backend())))
sys.exit(0 if healthy else 1)
