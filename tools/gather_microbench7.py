"""Microbench round 7: dense-mode pipeline primitives, launch-latency-free.

Each op is iterated CHAIN times INSIDE one jit program (lax.scan with a
data dependency) so the ~2-3 ms axon dispatch latency amortizes away.

Usage: python tools/gather_microbench7.py
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

Q = 1 << 19  # groups per tile (stride 4, L=2^21)
CAP = 150_000
CHAIN = 32
ITERS = 5
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    """fn(perturb_scalar, *args) -> array; chained via carried scalar."""

    def chained(*a):
        def body(carry, _):
            out = fn(carry, *a)
            return out.ravel()[0].astype(jnp.int32), out.ravel()[:1]

        c, outs = jax.lax.scan(
            body, jnp.int32(0), None, length=CHAIN
        )
        return c

    f = jax.jit(chained)
    try:
        r = jax.device_get(f(*args))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:110]}")
        return None
    best = 1e9
    for _ in range(ITERS):
        t0 = time.perf_counter()
        r = jax.device_get(f(*args))
        best = min(best, (time.perf_counter() - t0))
    dt = best / CHAIN
    print(f"{name:46s} {dt*1e3:8.3f} ms   chk={r}")
    return dt


print("-- primitives at Q=2^19 --")
x = jax.device_put(rng.integers(0, 100, Q).astype(np.int32))
timeit("cumsum 2^19 int32", lambda p, v: jnp.cumsum(v + p), x)
timeit("cummax 2^19 int32", lambda p, v: jax.lax.cummax(v + p, axis=0), x)
x150 = jax.device_put(rng.integers(0, 100, CAP).astype(np.int32))
timeit("cumsum 150k int32", lambda p, v: jnp.cumsum(v + p), x150)
timeit("cummax 150k int32", lambda p, v: jax.lax.cummax(v + p, axis=0), x150)
idx150 = jax.device_put(rng.integers(0, Q, CAP).astype(np.int32))
timeit(
    "scatter-max 150k into 150k",
    lambda p, i: jnp.zeros((CAP,), jnp.int32)
    .at[jnp.clip(i + p, 0, CAP - 1)]
    .max(i),
    idx150,
)
timeit(
    "scatter-max 16k into 150k",
    lambda p, i: jnp.zeros((CAP,), jnp.int32)
    .at[jnp.clip(i[: 1 << 14] + p, 0, CAP - 1)]
    .max(i[: 1 << 14]),
    idx150,
)

flags_np = rng.random(Q) < 0.28
flags = jax.device_put(flags_np)
print(f"-- compaction, survivor rate 0.28 ({flags_np.sum()}) --")
timeit(
    "direct nonzero size=150k",
    lambda p, f: jnp.nonzero(f ^ (p > 10**9), size=CAP, fill_value=Q - 1)[0],
    flags,
)

print("-- gathers (CHAINed) --")
for logw, nk in ((23, CAP), (25, CAP), (23, Q), (13, Q)):
    tab = jax.device_put(rng.integers(0, 2**31, 1 << logw).astype(np.int32))
    keys = jax.device_put(rng.integers(0, 1 << logw, nk).astype(np.int32))
    dt = timeit(
        f"gather {nk//1000}k from 2^{logw} words",
        lambda p, t, k: t[
            jnp.bitwise_and(k + p, (1 << logw) - 1)
        ],
        tab,
        keys,
    )
    if dt:
        print(f"{'':46s} -> {dt/nk*1e9:.2f} ns/key")

for cols in (2, 6, 8):
    tab = jax.device_put(
        rng.integers(0, 2**31, (1 << 19, cols)).astype(np.int32)
    )
    keys = jax.device_put(rng.integers(0, 1 << 19, CAP).astype(np.int32))
    dt = timeit(
        f"row gather 150k x {cols} cols",
        lambda p, t, k: t[jnp.bitwise_and(k + p, (1 << 19) - 1)],
        tab,
        keys,
    )
    if dt:
        print(f"{'':46s} -> {dt/CAP*1e9:.2f} ns/row")
