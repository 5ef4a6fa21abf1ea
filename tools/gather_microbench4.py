"""Microbench round 4: u8<->u16 bitcast cost, multiplicative hash,
2^21-word table gather — the quad front-end primitives.

Usage: python tools/gather_microbench4.py
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


# correctness of the u8->u16 bitcast byte order (vs numpy view)
b = np.arange(16, dtype=np.uint8)
want = b.view(np.uint16)
got = np.asarray(
    jax.jit(
        lambda x: jax.lax.bitcast_convert_type(
            x.reshape(-1, 2), jnp.uint16
        ).reshape(-1)
    )(jnp.asarray(b))
)
print("bitcast u8->u16 little-endian:", bool((got == want).all()), got[:4], want[:4])

B = 1 << 21  # bytes (one 2M-position packed tile is ~1MB; use 2MB)
xb = jnp.asarray(rng.integers(0, 255, B, dtype=np.uint8))


def bc(i, xb):
    y = jax.lax.bitcast_convert_type((xb ^ i.astype(jnp.uint8)).reshape(-1, 2), jnp.uint16)
    return jnp.sum(y.astype(jnp.uint32))


timeit("bitcast u8[2^21]->u16 + sum", chain(bc), B, xb)


def nosum(i, xb):
    return jnp.sum((xb ^ i.astype(jnp.uint8)).astype(jnp.uint32))


timeit("u8[2^21] sum (floor)", chain(nosum), B, xb)

# q8 construction: u16 -> per-word packed 2-bit codes + amb mask
x16 = jnp.asarray(rng.integers(0, 1 << 16, 1 << 20, dtype=np.uint16))


def q8(i, x16):
    w = (x16 ^ i.astype(jnp.uint16)).astype(jnp.uint32)
    n0, n1, n2, n3 = w & 15, (w >> 4) & 15, (w >> 8) & 15, (w >> 12) & 15
    q = ((n0 & 3) << 6) | ((n1 & 3) << 4) | ((n2 & 3) << 2) | (n3 & 3)
    amb = ((n0 | n1 | n2 | n3) >= 4)
    return (jnp.sum(q) + jnp.sum(amb.astype(jnp.uint32))).astype(jnp.uint32)


timeit("q8+amb decode 2^20 u16 lanes", chain(q8), 1 << 20, x16)

# multiplicative hash + gather from 2^21/2^20 word tables, Q=2^19 lookups
Q = 1 << 19
qh = jnp.asarray(rng.integers(0, 1 << 28, Q, dtype=np.uint32))
for logT in (20, 21):
    T = 1 << logT
    tab = jnp.asarray(rng.integers(0, 1 << 31, T, dtype=np.uint32))

    def mh(i, qh, tab, lt=logT):
        h = (qh ^ i) * jnp.uint32(0x9E3779B1)
        bk = h >> (32 - (lt + 5))
        w = tab[(bk >> 5).astype(jnp.int32)]
        return jnp.sum(((w >> (bk & 31)) & 1).astype(jnp.uint32))

    timeit(f"multhash+gather tab=2^{logT} w Q=2^19", chain(mh), Q, qh, tab)
