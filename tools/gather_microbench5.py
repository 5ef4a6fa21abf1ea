"""Microbench round 5: can Pallas beat XLA's ~7-10 ns/element random gather?

Strategies tried for "flags[i] = bit test of table at keys[i]":
  A. XLA gather baseline (what the production bloom stage does)
  B. Pallas, vectorized jnp.take from a VMEM-resident table
  C. Pallas, scalar fori_loop of VMEM loads
  D. XLA gather with 2D-shaped index layouts (alternative lowerings)

Usage: python tools/gather_microbench5.py [log2_table_words] [log2_nkeys]
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOGT = int(sys.argv[1]) if len(sys.argv) > 1 else 20  # table words (u32)
LOGQ = int(sys.argv[2]) if len(sys.argv) > 2 else 19  # number of keys
T = 1 << LOGT
Q = 1 << LOGQ
ITERS = 20
rng = np.random.default_rng(0)

table_np = rng.integers(0, 2**32, size=T, dtype=np.uint32)
keys_np = rng.integers(0, T * 32, size=Q, dtype=np.uint32)
table = jax.device_put(table_np)
keys = jax.device_put(keys_np)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    try:
        r = jax.device_get(f(*args))
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:130]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(f(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{name:44s} {per*1e3:8.3f} ms  {Q/per/1e6:8.0f} M keys/s  sum={int(r)}")
    return per


def chain(body):
    def outer(*args):
        def it(i, acc):
            k2 = args[-1] ^ (acc & 1)  # defeat CSE
            return acc + body(*args[:-1], k2)
        return jax.lax.fori_loop(0, ITERS, it, jnp.uint32(0))
    return outer


# ---- A. XLA gather baseline -------------------------------------------------
def xla_bloom(tab, k):
    w = tab[(k >> 5).astype(jnp.int32)]
    return jnp.sum(((w >> (k & 31)) & 1).astype(jnp.uint32))

timeit("A: XLA gather u32 (baseline)", chain(xla_bloom), table, keys)


# ---- D. XLA gather, 2D index shapes ----------------------------------------
def xla_bloom_2d(rows):
    def f(tab, k):
        k2 = k.reshape(rows, -1)
        w = tab[(k2 >> 5).astype(jnp.int32)]
        return jnp.sum(((w >> (k2 & 31)) & 1).astype(jnp.uint32))
    return f

for rows in (8, 128, 1024):
    timeit(f"D: XLA gather idx 2D rows={rows}", chain(xla_bloom_2d(rows)), table, keys)


# ---- B. Pallas vectorized take from VMEM -----------------------------------
def pallas_take_kernel(tab_ref, keys_ref, out_ref):
    k = keys_ref[:]
    w = jnp.take(tab_ref[:], (k >> 5).astype(jnp.int32), axis=0)
    out_ref[0, 0] = jnp.sum(((w >> (k & 31)) & 1).astype(jnp.uint32))

def pallas_take(tab, k):
    return pl.pallas_call(
        pallas_take_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(tab, k)[0, 0]

timeit("B: pallas jnp.take VMEM table", chain(pallas_take), table, keys)


# ---- B2. Pallas take_along_axis 2D -----------------------------------------
def pallas_taa_kernel(tab_ref, keys_ref, out_ref):
    k = keys_ref[:]  # (R, C)
    tab2 = tab_ref[:]  # (T//128, 128)? no — full
    w = jnp.take(tab_ref[:].reshape(-1), (k >> 5).astype(jnp.int32), axis=0)
    out_ref[0, 0] = jnp.sum(((w >> (k & 31)) & 1).astype(jnp.uint32))

def pallas_taa(tab, k):
    return pl.pallas_call(
        pallas_taa_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(tab.reshape(-1, 128), k.reshape(-1, 128))[0, 0]

timeit("B2: pallas take, 2D key layout", chain(pallas_taa), table, keys)


# ---- C. Pallas scalar loop -------------------------------------------------
def pallas_scalar_kernel(keys_smem, tab_ref, out_ref):
    def body(i, acc):
        k = keys_smem[i]
        w = tab_ref[(k >> 5).astype(jnp.int32)]
        return acc + ((w >> (k & 31)) & 1)
    out_ref[0, 0] = jax.lax.fori_loop(0, Q, body, jnp.uint32(0))

def pallas_scalar(tab, k):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    return pl.pallas_call(
        pallas_scalar_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
        grid_spec=grid_spec,
    )(k.astype(jnp.int32), tab)[0, 0]

timeit("C: pallas scalar fori_loop (SMEM keys)", chain(pallas_scalar), table, keys)
