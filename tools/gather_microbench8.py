"""Microbench round 8: blocked 2D scans vs XLA 1D cumsum/cummax.

A 1D cumsum over >100k elements costs ~1 ms on this TPU (fixed-cost
lowering). A hand-blocked scan — log-shifted adds along a 256-wide minor
axis + a recursive scan of block totals + broadcast — should be ~VPU
speed. Verifies correctness vs jnp.cumsum and times both.

Usage: python tools/gather_microbench8.py
"""

import sys, os, time, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

CHAIN = 32
ITERS = 5
rng = np.random.default_rng(0)


def blocked_scan(x, op, C=256):
    """Inclusive 1D scan of op (add/max) via a (B, C) relayout."""
    n = x.shape[0]
    if n <= C:
        y = x
        k = 1
        while k < n:
            y = op(y, jnp.concatenate([jnp.full((k,), _ident(op, y.dtype)), y[:-k]]))
            k *= 2
        return y
    B = -(-n // C)
    if B * C != n:
        x = jnp.concatenate([x, jnp.full((B * C - n,), _ident(op, x.dtype))])
    y = x.reshape(B, C)
    k = 1
    while k < C:
        pad = jnp.full((B, k), _ident(op, x.dtype))
        y = op(y, jnp.concatenate([pad, y[:, :-k]], axis=1))
        k *= 2
    tot = y[:, -1]
    carry = blocked_scan(tot, op, C)
    carry = jnp.concatenate([jnp.full((1,), _ident(op, x.dtype)), carry[:-1]])
    return op(y, carry[:, None]).reshape(B * C)[:n]


def _ident(op, dtype):
    return jnp.array(0 if op is jnp.add else np.iinfo(np.int32).min, dtype)


def timeit(name, fn, *args):
    def chained(*a):
        def body(carry, _):
            out = fn(carry, *a)
            return out.ravel()[-1].astype(jnp.int32) & 1, out.ravel()[-1:]

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=CHAIN)
        return c

    f = jax.jit(chained)
    try:
        r = jax.device_get(f(*args))
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:110]}")
        return None
    best = 1e9
    for _ in range(ITERS):
        t0 = time.perf_counter()
        r = jax.device_get(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/CHAIN*1e3:8.3f} ms   chk={r}")
    return best / CHAIN


# correctness
for n in (1 << 19, 150_016, 4096):
    x = rng.integers(-5, 100, n).astype(np.int32)
    got = np.asarray(jax.jit(functools.partial(blocked_scan, op=jnp.add))(x))
    assert (got == np.cumsum(x)).all(), n
    gotm = np.asarray(jax.jit(functools.partial(blocked_scan, op=jnp.maximum))(x))
    assert (gotm == np.maximum.accumulate(x)).all(), n
print("correctness OK")

for n in (1 << 19, 150_016):
    x = jax.device_put(rng.integers(0, 100, n).astype(np.int32))
    print(f"-- n={n} --")
    timeit("jnp.cumsum 1D", lambda p, v: jnp.cumsum(v + p), x)
    timeit(
        "blocked cumsum C=256",
        lambda p, v: blocked_scan(v + p, jnp.add),
        x,
    )
    timeit(
        "blocked cumsum C=512",
        lambda p, v: blocked_scan(v + p, jnp.add, C=512),
        x,
    )
    timeit("lax.cummax 1D", lambda p, v: jax.lax.cummax(v + p, axis=0), x)
    timeit(
        "blocked cummax C=256",
        lambda p, v: blocked_scan(v + p, jnp.maximum),
        x,
    )

print("-- harness floor --")
x = jax.device_put(rng.integers(0, 100, 1 << 19).astype(np.int32))
timeit("null: x[:8]+p", lambda p, v: v[:8] + p, x)
timeit("elementwise: x+p (2^19)", lambda p, v: v + p, x)
timeit("8 shifted adds (2^19)", lambda p, v: functools.reduce(
    lambda a, k: a + jnp.roll(a, 1 << k), range(8), v + p), x)
