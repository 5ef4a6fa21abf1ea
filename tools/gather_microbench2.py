"""Microbench round 2: scatter rate, u8 row gathers, wide rows, cummax —
the primitives for scatter-based compaction and row-gather verify.

Usage: python tools/gather_microbench2.py
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


# --- scatter rates (the compaction primitive) ---------------------------
for logN in (15, 17):
    N = 1 << logN
    idx = jnp.asarray(np.sort(rng.choice(1 << 20, N, replace=False)).astype(np.int32))
    val = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))

    def scatter_set(i, idx, val):
        out = jnp.zeros((1 << 20,), jnp.int32)
        out = out.at[idx ^ i.astype(jnp.int32)].set(val)
        return jnp.sum(out).astype(jnp.uint32)

    timeit(f"scatter-set N=2^{logN} into 2^20", chain(scatter_set), N, idx, val)

N = 1 << 15
idx = jnp.asarray(np.sort(rng.choice(1 << 15, N, replace=False)).astype(np.int32))
val = jnp.asarray(rng.integers(0, 1 << 20, N, dtype=np.int32))
def scatter_small(i, idx, val):
    out = jnp.zeros((1 << 15,), jnp.int32)
    out = out.at[idx].set(val ^ i.astype(jnp.int32))
    return jnp.sum(out).astype(jnp.uint32)
timeit("scatter-set N=2^15 into 2^15", chain(scatter_small), N, idx, val)

# --- cummax (the fill primitive) ----------------------------------------
x = jnp.asarray(rng.integers(0, 1 << 20, 1 << 17, dtype=np.int32))
def cmax(i, x):
    return jnp.sum(jax.lax.cummax(x ^ i.astype(jnp.int32), axis=0)).astype(jnp.uint32)
timeit("cummax 2^17", chain(cmax), 1 << 17, x)

def csum(i, x):
    return jnp.sum(jnp.cumsum(x ^ i.astype(jnp.int32))).astype(jnp.uint32)
timeit("cumsum 2^17", chain(csum), 1 << 17, x)

# --- searchsorted baseline for the same inversion -----------------------
cum = jnp.asarray(np.cumsum(rng.integers(0, 4, 1 << 17, dtype=np.int32)).astype(np.int32))
q = jnp.asarray(np.arange(1 << 17, dtype=np.int32))
def ssort(i, cum, q):
    return jnp.sum(jnp.searchsorted(cum, q ^ i.astype(jnp.int32), side="right")).astype(jnp.uint32)
timeit("searchsorted 2^17 queries/2^17 tab", chain(ssort), 1 << 17, cum, q)

# --- u8 row gathers of consecutive bytes (verify primitive) -------------
TB = 1 << 21
plane8 = jnp.asarray(rng.integers(0, 255, (TB // 8, 8), dtype=np.uint8))
plane16 = plane8.reshape(TB // 16, 16)
plane32 = plane8.reshape(TB // 32, 32)
for width, plane in ((8, plane8), (16, plane16), (32, plane32)):
    NC = 1 << 17  # candidates
    ridx = jnp.asarray(rng.integers(0, TB // width - 4, NC, dtype=np.int32))

    def rowg(i, ridx, plane, w=width):
        r = plane[ridx ^ (i.astype(jnp.int32) & 1)]
        return jnp.sum(r.astype(jnp.uint32))

    timeit(f"u8 row-gather w={width} N=2^17 rows", chain(rowg), NC * width, ridx, plane)

# 3 consecutive rows per candidate (unaligned 16B read emulation)
NC = 1 << 17
ridx = jnp.asarray(rng.integers(0, TB // 8 - 4, NC, dtype=np.int32))
def rowg3(i, ridx, plane):
    ix = ridx ^ (i.astype(jnp.int32) & 1)
    r = plane[ix[:, None] + jnp.arange(3)[None, :]]  # (NC, 3, 8)
    return jnp.sum(r.astype(jnp.uint32))
timeit("u8 3-row-gather w=8 N=2^17", chain(rowg3), NC * 24, ridx, plane8)

# u32 row gathers width 16/32 (bloom-mask row idea)
tabw = jnp.asarray(rng.integers(0, 1 << 31, (1 << 14, 16), dtype=np.uint32))
ridx = jnp.asarray(rng.integers(0, 1 << 14, 1 << 17, dtype=np.uint32))
def rowg32(i, ridx, tab):
    r = tab[(ridx ^ (i & jnp.uint32(1))).astype(jnp.int32)]
    return jnp.sum(r)
timeit("u32 row-gather w=16 N=2^17 rows", chain(rowg32), (1 << 17) * 16, ridx, tabw)
