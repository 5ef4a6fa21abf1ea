"""Microbench round 3: large-table gather rates (quad-bloom feasibility)
and stride-2 slicing (parity stream splitting).

Usage: python tools/gather_microbench3.py
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

ITERS = 20
rng = np.random.default_rng(0)


def timeit(name, fn, n_items, *args):
    f = jax.jit(fn)
    try:
        _ = jax.device_get(f(*args))
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:110]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(f(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{name:40s} {per*1e3:8.3f} ms  {n_items/per/1e6:8.0f} M items/s")
    return per


def chain(body):
    def outer(*args):
        def it(i, acc):
            return acc + body(i, *args)
        return jax.lax.fori_loop(0, ITERS, it, jnp.uint32(0))
    return outer


N = 1 << 19  # lookups per iter (the quad-bloom load for a 2M tile)
idx = jnp.asarray(rng.integers(0, 1 << 25, N, dtype=np.uint32))

for logT, dt in ((20, np.uint32), (23, np.uint32), (25, np.uint32),
                 (25, np.uint8)):
    T = 1 << logT
    table = jnp.asarray(
        rng.integers(0, 200, T, dtype=np.uint8).astype(dt)
        if dt == np.uint8
        else rng.integers(0, 1 << 31, T, dtype=np.uint32)
    )
    mask = jnp.uint32(T - 1)

    def g(i, ix, tb, m=mask):
        r = tb[((ix ^ i) & m).astype(jnp.int32)]
        return jnp.sum(r.astype(jnp.uint32))

    nm = np.dtype(dt).name
    timeit(f"gather {nm} table=2^{logT} N=2^19", chain(g), N, idx, table)

# stride-2 slice of a 1M-lane u32 array (parity split)
x = jnp.asarray(rng.integers(0, 1 << 31, 1 << 20, dtype=np.uint32))
def sl(i, x):
    y = x ^ i
    return (jnp.sum(y[0::2]) + jnp.sum(y[1::2])).astype(jnp.uint32)
timeit("stride-2 split 2^20 u32", chain(sl), 1 << 20, x)

# gather-free baseline: same arrays, elementwise only (sanity floor)
def ew(i, x):
    return jnp.sum((x ^ i) >> 5).astype(jnp.uint32)
timeit("elementwise 2^20 u32 (floor)", chain(ew), 1 << 20, x)
