"""Per-stage device timing: STREAM cfg (HEAD caps, gap terms) vs RECORD
cfg at the same tile length on the same random plane — where does the
stream tile's extra per-position time go?

TPU diagnostic; not part of the test suite.
"""

import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from merpcr_tpu.engine import MerPCR
from merpcr_tpu.io.sts import STSLoader
from merpcr_tpu.ops import scan as S
from merpcr_tpu.ops.table import compile_table

LOG2L = int(sys.argv[1]) if len(sys.argv) > 1 else 21
L = 1 << LOG2L

rng = random.Random(0)
td = tempfile.mkdtemp()
sp = os.path.join(td, "b.sts")
with open(sp, "w") as fh:
    for i in range(1000):
        p1 = "".join(rng.choices("ACGT", k=22))
        p2 = "".join(rng.choices("ACGT", k=22))
        fh.write(f"S{i}\t{p1}\t{p2}\t{rng.randrange(100,400)}\n")
res = STSLoader.load_file(sp, 11, 240)

eng = MerPCR()
assert eng.load_sts_file(sp)
table = eng._table
meta = eng._meta

# the two production configs (record vs stream as the engine builds them
# for the scaffold workload: dirty=0 record; stream gets gap terms)
cfg_rec = eng._base_config(L, packed=True)
cfg_str = eng._base_config(
    L, packed=True, stream=True, gaps_per_tile=256.0
)
print("record caps:", cfg_rec.cpos_cap, cfg_rec.pos_cap, cfg_rec.cand_cap)
print("stream caps:", cfg_str.cpos_cap, cfg_str.pos_cap, cfg_str.cand_cap)

rt = jnp.asarray([50, 0, 1], dtype=jnp.int32)
nbytes = max(cfg_rec.tile_buf_in, cfg_str.tile_buf_in)
raw = np.asarray(
    [rng.randrange(4) | (rng.randrange(4) << 4) for _ in range(1 << 16)],
    dtype=np.uint8,
)
raw = np.tile(raw, -(-nbytes // len(raw)))[:nbytes]

# stream metadata: 200 records in this tile (like 3000 over 15 tiles)
n_rec = 200
rmeta = np.zeros((256, 2), np.int64)
starts = np.sort(rng.sample(range(0, L - 1000, 8), n_rec))
rmeta[:n_rec, 0] = starts
rmeta[:n_rec, 1] = 10**9
rmeta[n_rec:, 0] = np.iinfo(np.int32).max
rmeta = rmeta.astype(np.int32)
recmap_np = (
    np.searchsorted(rmeta[:n_rec, 0], np.arange(0, L, 8) * 1, side="right")
    - 1
).clip(0, n_rec - 1).astype(np.int32)
rmeta_d = jax.device_put(rmeta)
recmap_d = jax.device_put(recmap_np)

n_scan = jnp.int32(L)
record_len = jnp.int32(10**9)
tile_start = jnp.int32(0)
N = 20


def timeit(name, body, tbd):
    def outer(tb):
        def it(i, acc):
            tb2 = tb ^ (acc & 1).astype(jnp.uint8)
            return acc + body(tb2)

        return jax.lax.fori_loop(0, N, it, jnp.int32(0))

    f = jax.jit(outer)
    _ = jax.device_get(f(tbd))
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        _ = jax.device_get(f(tbd))
        best = min(best, time.perf_counter() - t0)
    dt = best / N
    print(f"{name:26s} {dt*1e3:9.3f} ms/tile  {L/dt/1e6:8.0f} Mbp/s",
          flush=True)
    return dt


def full_rec(tb):
    o = S._scan_tile_impl(
        cfg_rec, table, tb[: cfg_rec.tile_buf_in], tile_start, n_scan,
        record_len, rt
    )
    return (
        o.c_total + o.pair_total + o.anch_total + o.hit_total
        + jnp.sum(o.pos1)
    ).astype(jnp.int32)


def full_str(tb):
    o = S._scan_tile_impl(
        cfg_str, table, tb[: cfg_str.tile_buf_in], tile_start, n_scan,
        jnp.int32(L), rt, rmeta=rmeta_d, recmap=recmap_d
    )
    return (
        o.c_total + o.pair_total + o.anch_total + o.hit_total
        + jnp.sum(o.pos1)
    ).astype(jnp.int32)


def staged(cfg, stage, stream):
    def body(tb):
        if stream:
            o = S._scan_tile_impl(
                cfg, table, tb[: cfg.tile_buf_in], tile_start, n_scan,
                jnp.int32(L), rt, stop=stage, rmeta=rmeta_d,
                recmap=recmap_d
            )
        else:
            o = S._scan_tile_impl(
                cfg, table, tb[: cfg.tile_buf_in], tile_start, n_scan,
                record_len, rt, stop=stage
            )
        return o.c_total

    return body


tbd = jax.device_put(raw)
timeit("FULL record", full_rec, tbd)
timeit("FULL stream", full_str, tbd)

for st in ["words", "nonzero", "compact", "nb", "posrank", "posg2", "pos",
           "expand", "p1"]:
    a = timeit(f"rec:{st}", staged(cfg_rec, st, False), tbd)
    b = timeit(f"str:{st}", staged(cfg_str, st, True), tbd)
    print(f"{'':26s} stream-minus-record delta {1e3*(b-a):7.3f} ms")
