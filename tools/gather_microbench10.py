"""Microbench round 10b: production bloom-stage shape — 2 parities x 262144
gathers per tile — vs table size, plus the fold arithmetic (shift+xor+and).

Question: how much does folding the 33.5 MB exact any-phase table down to
8 MB / 2 MB save at the production gather shape? (fori_loop harness.)

Usage: python tools/gather_microbench10.py
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

QP = 1 << 18  # per-parity groups at L=2^21, S=4
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
        _ = jax.device_get(f(*args))
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:52s} {best*1e3:8.3f} ms  ({best/(2*QP)*1e9:5.2f} ns/key)")
    return best


keys = jnp.asarray(rng.integers(0, 1 << 28, size=(2, QP), dtype=np.uint32))

for bits in (28, 26, 24, 21):
    tab = jnp.asarray(
        rng.integers(0, 1 << 32, size=(1 << bits) // 32, dtype=np.uint64).astype(
            np.uint32
        )
    )
    fold = bits < 28

    def body(acc, keys, tab, bits=bits, fold=fold):
        tot = jnp.int32(0)
        for p in range(2):
            bk = keys[p] ^ acc.astype(jnp.uint32)
            if fold:
                bk = (bk ^ (bk >> bits)) & jnp.uint32((1 << bits) - 1)
            w = tab[(bk >> 5).astype(jnp.int32)]
            tot = tot + jnp.sum(((w >> (bk & 31)) & 1).astype(jnp.int32))
        return tot

    timeit(f"2x262k bloom gathers, 2^{bits} bits ({4**14*('%d'%bits==str(bits)) and 0 or 0})"
           f"{(1<<bits)//8//2**20} MB{' +fold' if fold else ' exact'}",
           body, keys, tab)
