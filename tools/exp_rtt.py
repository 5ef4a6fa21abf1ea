"""Measure the tunnel's blocking-fetch RTT + tiny-program dispatch cost.

TPU diagnostic; not part of the test suite.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

x = jax.device_put(np.arange(8, dtype=np.int32))
f = jax.jit(lambda v: v + 1)
_ = jax.device_get(f(x))

for name, body in (
    ("device_get tiny", lambda: jax.device_get(x)),
    ("jit+get tiny", lambda: jax.device_get(f(x))),
):
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        body()
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)
    print(f"{name}: min={ts[0]*1e3:.2f} ms p50={ts[10]*1e3:.2f} ms")

# chained: N tiny programs enqueued then one fetch
for N in (1, 15, 60):
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        ys = [f(x) for _ in range(N)]
        jax.device_get(ys)
        ts.append(time.perf_counter() - t0)
    print(f"enqueue {N} tiny programs + bulk get: min={min(ts)*1e3:.2f} ms")

# D2H bandwidth probe
big = jax.device_put(np.zeros(1 << 24, np.uint8))  # 16 MB
jax.device_get(big)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    jax.device_get(big)
    ts.append(time.perf_counter() - t0)
print(f"16 MB D2H: min={min(ts)*1e3:.1f} ms")
