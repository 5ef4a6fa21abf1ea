"""Microbench round 6: Mosaic 2D-gather forms — which compile, how fast,
and how big can the VMEM-resident table get.

The production idea: a lane-replicated bloom tab[R, 128] (tab[r, c] =
bloom_word[r] for every lane c) lets EVERY lane test its own key with
jnp.take_along_axis(tab, idx, axis=0) — a vectorized per-lane row select.

Usage: python tools/gather_microbench6.py [log2_rows] [log2_nkeys]
"""

import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOGR = int(sys.argv[1]) if len(sys.argv) > 1 else 14  # table rows
LOGQ = int(sys.argv[2]) if len(sys.argv) > 2 else 21  # number of keys
R = 1 << LOGR
Q = 1 << LOGQ
QR = Q // 128
ITERS = 20
rng = np.random.default_rng(0)

tab_np = rng.integers(0, 2**32, size=R, dtype=np.uint32)
tab2d_np = np.broadcast_to(tab_np[:, None], (R, 128)).copy()
# keys: row indices + bit positions packed as r*32 + b
keys_np = rng.integers(0, R * 32, size=(QR, 128), dtype=np.int32)
tab2d = jax.device_put(tab2d_np)
keys = jax.device_put(keys_np)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    try:
        r = jax.device_get(f(*args))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(f(*args))
        best = min(best, time.perf_counter() - t0)
    per = best / ITERS
    print(f"{name:46s} {per*1e3:8.3f} ms  {Q/per/1e6:8.0f} M keys/s  sum={int(r)}")
    return per


def chain(body):
    def outer(*args):
        def it(i, acc):
            k2 = args[-1] ^ (acc & 1).astype(args[-1].dtype)
            return acc + body(*args[:-1], k2)
        return jax.lax.fori_loop(0, ITERS, it, jnp.uint32(0))
    return outer


def mk_pallas(kernel):
    def f(tab, k):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tab, k)[0, 0]
    return f


# ---- XLA take_along_axis (outside pallas) ----------------------------------
def xla_taa(tab, k):
    w = jnp.take_along_axis(tab, (k >> 5), axis=0)
    return jnp.sum(((w >> (k & 31)) & 1).astype(jnp.uint32))

timeit("XLA take_along_axis axis=0", chain(xla_taa), tab2d, keys)


# ---- pallas take_along_axis axis=0 -----------------------------------------
def k_taa0(tab_ref, keys_ref, out_ref):
    k = keys_ref[:]
    w = jnp.take_along_axis(tab_ref[:], (k >> 5), axis=0)
    out_ref[0, 0] = jnp.sum(((w >> (k & 31)) & 1).astype(jnp.uint32))

timeit("pallas take_along_axis axis=0", chain(mk_pallas(k_taa0)), tab2d, keys)


# ---- pallas take_along_axis in row-chunks (smaller vreg pressure) ----------
def k_taa_chunk(tab_ref, keys_ref, out_ref):
    tab = tab_ref[:]
    CH = 512
    acc = jnp.zeros((CH, 128), jnp.uint32)
    for i in range(QR // CH):
        k = keys_ref[i * CH : (i + 1) * CH, :]
        w = jnp.take_along_axis(tab, (k >> 5), axis=0)
        acc = acc + ((w >> (k & 31)) & 1).astype(jnp.uint32)
    out_ref[0, 0] = jnp.sum(acc)

timeit("pallas taa chunked 512 rows", chain(mk_pallas(k_taa_chunk)), tab2d, keys)


# ---- pallas lax.gather equivalent ------------------------------------------
def k_gather(tab_ref, keys_ref, out_ref):
    k = keys_ref[:]
    tab = tab_ref[:]
    w = jax.vmap(lambda col_t, col_i: col_t[col_i], in_axes=1, out_axes=1)(
        tab, (k >> 5)
    )
    out_ref[0, 0] = jnp.sum(((w >> (k & 31)) & 1).astype(jnp.uint32))

timeit("pallas vmap per-lane index", chain(mk_pallas(k_gather)), tab2d, keys)


# ---- VMEM ceiling probe ----------------------------------------------------
print("\nVMEM ceiling probe (table alone):")
for logr in (15, 16, 17, 18):
    Rp = 1 << logr
    tb = jax.device_put(np.zeros((Rp, 128), np.uint32))
    kk = jax.device_put(np.zeros((64, 128), np.int32))

    def k_small(tab_ref, keys_ref, out_ref):
        k = keys_ref[:]
        w = jnp.take_along_axis(tab_ref[:], (k >> 5), axis=0)
        out_ref[0, 0] = jnp.sum(((w >> (k & 31)) & 1).astype(jnp.uint32))

    try:
        r = jax.device_get(jax.jit(mk_pallas(k_small))(tb, kk))
        print(f"  rows=2^{logr} ({Rp*128*4/2**20:.0f} MB): OK")
    except Exception as e:
        print(f"  rows=2^{logr} ({Rp*128*4/2**20:.0f} MB): FAILED {type(e).__name__}: {str(e)[:90]}")
