"""Microbenchmark: random-gather throughput on the current backend.

Answers two design questions for the scan pipeline's bloom stage (its
dominant cost — see tools/profile_stages.py):
  1. Does XLA's gather rate depend on table size (VMEM-resident vs HBM)?
  2. Can a Pallas kernel (VMEM table + in-kernel gather) beat XLA's gather?

Usage: python tools/gather_microbench.py
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

N = 1 << 20  # 1M lookups (the per-2Mbp-tile bloom load in pair mode)
ITERS = 20

rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    try:
        _ = jax.device_get(f(*args))
    except Exception as e:
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(f(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    rate = N / per / 1e6
    print(f"{name:34s} {per*1e3:8.3f} ms  {rate:8.0f} M lookups/s")
    return per


def chain(body):
    def outer(idx, table):
        def it(i, acc):
            ix = idx ^ i  # defeat CSE
            return acc + body(ix, table)
        return jax.lax.fori_loop(0, ITERS, it, jnp.uint32(0))
    return outer


idx_full = jnp.asarray(rng.integers(0, 1 << 17, N, dtype=np.uint32))

for logT in (10, 13, 15, 17, 20):
    T = 1 << logT
    table = jnp.asarray(rng.integers(0, 1 << 31, T, dtype=np.uint32))
    mask = jnp.uint32(T - 1)
    timeit(
        f"xla gather u32 table=2^{logT}",
        chain(lambda ix, tb, m=mask: jnp.sum(tb[(ix & m).astype(jnp.int32)])),
        idx_full, table,
    )

# int8 table: same element count
T = 1 << 17
table8 = jnp.asarray(rng.integers(0, 127, T, dtype=np.int8))
timeit(
    "xla gather i8  table=2^17",
    chain(lambda ix, tb: jnp.sum(tb[(ix & jnp.uint32(T - 1)).astype(jnp.int32)].astype(jnp.int32)).astype(jnp.uint32)),
    idx_full, table8,
)

# 2D one-gather-per-row variant: gather rows of (8,) — amortize per-elem cost?
tab2d = jnp.asarray(rng.integers(0, 1 << 31, (1 << 14, 8), dtype=np.uint32))
idx_row = jnp.asarray(rng.integers(0, 1 << 14, N // 8, dtype=np.uint32))
def row_gather(ix, tb):
    r = tb[(ix & jnp.uint32((1 << 14) - 1)).astype(jnp.int32)]
    return jnp.sum(r).astype(jnp.uint32)
timeit("xla row-gather (N/8 rows of 8)", chain(row_gather), idx_row, tab2d)

# --- Pallas attempts ----------------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mk_pallas_gather(T):
    def kernel(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:].astype(jnp.int32)
        out_ref[:] = tab_ref[ix]

    def run(idx, table):
        def body(ix, tb):
            got = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(ix & jnp.uint32(T - 1), tb)
            return jnp.sum(got)
        return chain(body)(idx, table)
    return run


for logT in (13, 17):
    T = 1 << logT
    table = jnp.asarray(rng.integers(0, 1 << 31, T, dtype=np.uint32))
    timeit(f"pallas flat-gather table=2^{logT}", mk_pallas_gather(T), idx_full, table)


# Pallas 2D take_along_axis style: reshape idx to (rows, 128); table
# broadcast per row is impossible at 2^17; try dynamic_gather of lanes via
# jnp.take fallback inside kernel
def mk_pallas_take(T):
    def kernel(idx_ref, tab_ref, out_ref):
        ix = idx_ref[:].astype(jnp.int32)
        out_ref[:] = jnp.take(tab_ref[:], ix, axis=0)

    def run(idx, table):
        def body(ix, tb):
            got = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(ix & jnp.uint32(T - 1), tb)
            return jnp.sum(got)
        return chain(body)(idx, table)
    return run


timeit("pallas jnp.take table=2^17", mk_pallas_take(1 << 17), idx_full,
       jnp.asarray(rng.integers(0, 1 << 31, 1 << 17, dtype=np.uint32)))
