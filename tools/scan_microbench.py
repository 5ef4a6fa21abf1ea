"""Microbench round 10: prefix-scan primitives under the TRUSTWORTHY
fori-loop harness (tools/profile_stages.py pattern; the lax.scan harness
in tools/MICROBENCH.md #4 has a ~1.1 ms/iter floor on this platform).

Targets the production _rank_invert sizes from the dense 50k-STS profile
(cpos_cap=149389 -> pos_cap=65512 -> cand_cap=65512), where each of the
three rank inversions appears to cost ~5 ms/tile. Candidates:

  * jnp.cumsum / lax.cummax 1D (the current implementation)
  * blocked 2D scan (log-shifted adds along a 256 minor axis)
  * MXU matmul prefix sum: (B,256)f32 @ lower-triangular ones + recursive
    block-total scan — the systolic array does 256 partial sums per cell.
  * full _rank_invert as shipped vs variants

Usage: python tools/scan_microbench.py
"""

import sys, os, time, functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from merpcr_tpu.ops.scan import _rank_invert
from merpcr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
N_ITER = 20
CHECK = os.environ.get("CHECK", "0") == "1"  # run on CPU: CHECK=1 JAX_PLATFORMS=cpu
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    """Chain N_ITER data-dependent iterations in ONE dispatch."""

    def outer(*a):
        def it(i, acc):
            a2 = (a[0] + (acc & 1).astype(a[0].dtype),) + a[1:]
            return acc + fn(*a2).ravel()[-1].astype(jnp.int32)

        return jax.lax.fori_loop(0, N_ITER, it, jnp.int32(0))

    f = jax.jit(outer)
    try:
        _ = jax.device_get(f(*args))
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:100]}")
        return None
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/N_ITER*1e3:8.3f} ms")
    return best / N_ITER


def blocked_scan_add(x, C=256):
    n = x.shape[0]
    B = -(-n // C)
    if B * C != n:
        x = jnp.concatenate([x, jnp.zeros((B * C - n,), x.dtype)])
    y = x.reshape(B, C)
    k = 1
    while k < C:
        y = y + jnp.concatenate([jnp.zeros((B, k), x.dtype), y[:, :-k]], axis=1)
        k *= 2
    tot = y[:, -1]
    if B > 1:
        carry = blocked_scan_add(tot, C) if B > C else jnp.cumsum(tot)
        carry = jnp.concatenate([jnp.zeros((1,), x.dtype), carry[:-1]])
        y = y + carry[:, None]
    return y.reshape(B * C)[:n]


def matmul_scan_add(x, C=256):
    """Inclusive prefix sum via lower-triangular matmul on the MXU.

    int32 values are exact in f32 while partial sums stay < 2^24 —
    true for candidate counts per tile (< 2^21)."""
    n = x.shape[0]
    B = -(-n // C)
    if B * C != n:
        x = jnp.concatenate([x, jnp.zeros((B * C - n,), x.dtype)])
    xf = x.reshape(B, C).astype(jnp.float32)
    tri = jnp.tril(jnp.ones((C, C), jnp.float32))  # tri[j,i]=1 for i<=j
    y = jax.lax.dot_general(
        xf, tri, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # y[b, j] = sum_{i<=j} xf[b, i]
    tot = y[:, -1]
    if B > 1:
        carry = (
            matmul_scan_add(tot.astype(jnp.int32), C).astype(jnp.float32)
            if B > C
            else jnp.cumsum(tot)
        )
        carry = jnp.concatenate([jnp.zeros((1,), jnp.float32), carry[:-1]])
        y = y + carry[:, None]
    return y.reshape(B * C)[:n].astype(jnp.int32)


def rank_invert_matmul(cnt, cap_out):
    """_rank_invert with matmul cumsum + matmul-scan cummax replacement.

    cummax over the scatter seed is replaced by: seed is nonzero at
    strictly increasing positions; cummax == blocked max-scan, done with
    the same shifted-op trick but on (B,256)."""
    S = cnt.shape[0]
    csum = matmul_scan_add(cnt)
    excl = csum - cnt
    tgt = jnp.where(cnt > 0, excl, cap_out)
    ids = jnp.arange(1, S + 1, dtype=jnp.int32)
    seed = jnp.zeros((cap_out,), jnp.int32).at[tgt].max(ids, mode="drop")
    src = jnp.clip(blocked_scan_max(seed) - 1, 0, S - 1)
    return src, excl[src]


def blocked_scan_max(x, C=256):
    n = x.shape[0]
    NEG = jnp.int32(-(1 << 30))
    B = -(-n // C)
    if B * C != n:
        x = jnp.concatenate([x, jnp.full((B * C - n,), NEG, x.dtype)])
    y = x.reshape(B, C)
    k = 1
    while k < C:
        y = jnp.maximum(
            y, jnp.concatenate([jnp.full((B, k), NEG, x.dtype), y[:, :-k]], axis=1)
        )
        k *= 2
    tot = y[:, -1]
    if B > 1:
        carry = blocked_scan_max(tot, C) if B > C else jax.lax.cummax(tot, axis=0)
        carry = jnp.concatenate([jnp.full((1,), NEG, x.dtype), carry[:-1]])
        y = jnp.maximum(y, carry[:, None])
    return y.reshape(B * C)[:n]


# ---- correctness (CHECK=1 JAX_PLATFORMS=cpu — compiles are cheap there) --
for n in (149_389, 65_512) if CHECK else ():
    x = rng.integers(0, 3, n).astype(np.int32)
    ref = np.cumsum(x)
    for nm, fn in (("blocked", blocked_scan_add), ("matmul", matmul_scan_add)):
        got = np.asarray(jax.jit(fn)(x))
        assert (got == ref).all(), (nm, n)
    xm = rng.integers(-100, 100, n).astype(np.int32)
    gotm = np.asarray(jax.jit(blocked_scan_max)(xm))
    assert (gotm == np.maximum.accumulate(xm)).all(), n
if CHECK:
    cnt = rng.integers(0, 2, 149_389).astype(np.int32)
    s0, e0 = jax.jit(functools.partial(_rank_invert, cap_out=65_512))(cnt)
    s1, e1 = jax.jit(functools.partial(rank_invert_matmul, cap_out=65_512))(cnt)
    tot = int(cnt.sum())
    k = min(tot, 65_512)
    assert (np.asarray(s0)[:k] == np.asarray(s1)[:k]).all()
    assert (np.asarray(e0)[:k] == np.asarray(e1)[:k]).all()
    print("correctness OK")
    sys.exit(0)

# ---- timing (each jit costs ~60 s cold over the tunnel; keep the list
# short — the persistent cache makes reruns cheap) ------------------------
n = 149_389
x = jax.device_put(rng.integers(0, 3, n).astype(np.int32))
print(f"-- n={n} --")
timeit("null (x[:8].sum)", lambda v: v[:8].sum(), x)
timeit("jnp.cumsum 1D", jnp.cumsum, x)
timeit("lax.cummax 1D", lambda v: jax.lax.cummax(v, axis=0), x)
timeit("matmul cumsum C=256", matmul_scan_add, x)
timeit("blocked cummax C=256", blocked_scan_max, x)
timeit(
    "_rank_invert shipped (cap 65512)",
    lambda v: _rank_invert(v, 65_512)[0],
    x,
)
timeit(
    "rank_invert matmul/blocked (cap 65512)",
    lambda v: rank_invert_matmul(v, 65_512)[0],
    x,
)
