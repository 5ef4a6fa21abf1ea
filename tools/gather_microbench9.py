"""Microbench round 9: front-end table gather vs table size (fori_loop
chained — the trustworthy harness; see tools/profile_stages.py).

Question: is the bloom-stage regression (4.2 -> 7.0 ms) caused by the
128 MB phase-bit table being slower to gather than the old 32 MB
any-phase table, or by the extra per-phase flag arithmetic?

Usage: python tools/gather_microbench9.py
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

NK = 1 << 19  # gathers per tile (2 parities x QP at L=2^21, S=4)
N = 20
rng = np.random.default_rng(0)


def timeit(name, body, *args):
    def outer(*a):
        def it(i, acc):
            return acc + body(acc, *a)

        return jax.lax.fori_loop(0, N, it, jnp.int32(0))

    f = jax.jit(outer)
    _ = jax.device_get(f(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = jax.device_get(f(*args))
        best = min(best, time.perf_counter() - t0)
    dt = best / N
    print(f"{name:52s} {dt*1e3:8.3f} ms  ({dt/NK*1e9:5.2f} ns/key)")
    return dt


# span values: 28-bit random (the real front end's idx distribution)
idx_np = rng.integers(0, 1 << 28, size=NK, dtype=np.uint32)
idx = jax.device_put(idx_np)

for logbytes in (23, 25, 27):  # 8 MB, 32 MB, 128 MB u32 tables
    nwords = (1 << logbytes) // 4
    tab = jax.device_put(
        rng.integers(0, 1 << 31, size=nwords, dtype=np.uint32)
    )
    sh = 28 - (logbytes - 2)  # idx >> sh spans the whole table

    def g1(acc, t, ix, sh=sh):
        ixx = (ix ^ acc.astype(jnp.uint32)) >> sh
        return jnp.sum(t[ixx.astype(jnp.int32)] & 1).astype(jnp.int32)

    timeit(f"plain gather, {1 << (logbytes - 20)} MB table", g1, tab, idx)

# phase-bit full pipeline tail: gather + nibble shift + 4 flag streams
nwords = (1 << 27) // 4
tab = jax.device_put(rng.integers(0, 1 << 31, size=nwords, dtype=np.uint32))


def g2(acc, t, ix):
    ixx = ix ^ acc.astype(jnp.uint32)
    word = t[(ixx >> 3).astype(jnp.int32)]
    nb = word >> ((ixx & 7) * jnp.uint32(4))
    s = jnp.int32(0)
    for d in range(4):
        s = s + jnp.sum(((nb >> d) & 1).astype(jnp.int32))
    return s


timeit("128 MB gather + nibble extract + 4 flag sums", g2, tab, idx)
