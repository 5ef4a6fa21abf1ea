"""Capture an XLA device trace of the full dense tile scan and print the
top ops by device time (parses the profiler's trace.json.gz).

Usage: python tools/trace_dense.py [n_sts] [log2_tile_len]
"""

import sys, os, time, tempfile, random, glob, gzip, json, collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from merpcr_tpu.ops import scan as S
from merpcr_tpu.ops.table import compile_table
from merpcr_tpu.io.sts import STSLoader

N_STS = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
LOG2L = int(sys.argv[2]) if len(sys.argv) > 2 else 21

rng = random.Random(0)
td = tempfile.mkdtemp()
sp = os.path.join(td, "b.sts")
with open(sp, "w") as fh:
    for i in range(N_STS):
        p1 = "".join(rng.choices("ACGT", k=22))
        p2 = "".join(rng.choices("ACGT", k=22))
        fh.write(f"S{i}\t{p1}\t{p2}\t{rng.randrange(100,400)}\n")
res = STSLoader.load_file(sp, 11, 240)
table, meta = compile_table(res, 11, False)
L = 1 << LOG2L
cfg = S.default_config(
    11, 50, 0, 1, meta.lead, res.max_pcr_size, meta.p1_max,
    meta.p2_max, meta.bloom_bits, tile_len=L, n_entries=meta.n_entries,
    stride=meta.stride, qbloom_bits=meta.qbloom_bits, n_unique=meta.n_unique,
    exact_group=meta.exact_group,
)
rt = jnp.asarray([50, 0, 1], dtype=jnp.int32)
nbytes = cfg.tile_buf_in
raw = np.random.default_rng(0).integers(0, 4, nbytes).astype(np.uint8)
raw = raw | (np.random.default_rng(1).integers(0, 4, nbytes).astype(np.uint8) << 4)
tbd = jax.device_put(raw)
N = 10


def full(tb):
    def it(i, acc):
        tb2 = tb ^ (acc & 1).astype(jnp.uint8)
        o = S._scan_tile_impl(
            cfg, table, tb2, jnp.int32(0), jnp.int32(L), jnp.int32(10**8), rt
        )
        return acc + (
            o.c_total + o.pair_total + o.anch_total + o.hit_total
        ).astype(jnp.int32)

    return jax.lax.fori_loop(0, N, it, jnp.int32(0))


f = jax.jit(full)
_ = jax.device_get(f(tbd))  # warm
tdir = tempfile.mkdtemp(prefix="trace_")
with jax.profiler.trace(tdir):
    _ = jax.device_get(f(tbd))

paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True)
print("trace files:", paths)
agg = collections.Counter()
cnt = collections.Counter()
longn = {}
for p in paths:
    with gzip.open(p, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        if "args" in ev and isinstance(ev["args"], dict):
            ln = ev["args"].get("long_name") or ev["args"].get("hlo_op") or ""
            if ln:
                longn[name] = ln
        agg[name] += dur
        cnt[name] += 1

total = sum(agg.values())
print(f"total traced op-us: {total} (N={N} tiles)")
for name, us in agg.most_common(40):
    print(f"{us/N:10.1f} us/tile  x{cnt[name]:<5d} {name[:60]}")
    ln = longn.get(name, "")
    if ln:
        print(f"{'':24s}{ln[:300]}")
