"""Split the warm scaffold search's ~82 ms into dispatch / device /
fetch / post-process, by poking engine internals.

TPU diagnostic; not part of the test suite.
"""

import io
import os
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
import merpcr_tpu

td = tempfile.mkdtemp()
sts_path, fa_path, n = bench.gen_data(td, 30.0, 1000, n_records=3000)
eng = merpcr_tpu.MerPCR()
assert eng.load_sts_file(sts_path)
recs = eng.load_fasta_file(fa_path)
for _ in range(2):
    with redirect_stdout(io.StringIO()):
        eng.search(recs, None)

# the plan is cached now; grab the stream item
plan = eng._plan_cache[1]
assert len(plan) == 1 and plan[0][0] == "stream", [p[0] for p in plan]
items = plan[0][2]

import jax

N = 10
for rep in range(3):
    t_disp = t_fetch = t_post = 0.0
    for _ in range(N):
        t0 = time.perf_counter()
        ctx = eng._dispatch_stream(items)
        t1 = time.perf_counter()
        arrs = eng._collect_stream(ctx)
        t2 = time.perf_counter()
        t_disp += t1 - t0
        t_fetch += t2 - t1
    print(
        f"dispatch={t_disp/N*1e3:.1f} ms  collect={t_fetch/N*1e3:.1f} ms",
        flush=True,
    )

# how many pending groups / arrays?
ctx = eng._dispatch_stream(items)
pend = ctx[4]
print("n_groups:", len(pend), "fields/group:", len(pend[0]))
cfg0 = ctx[1]
print("cfg caps:", cfg0.cpos_cap, cfg0.pos_cap, cfg0.cand_cap, cfg0.anch_cap,
      cfg0.hit_cap, "tile_len:", cfg0.tile_len, "G:", eng._tile_group(cfg0))

# fetch cost if we block on ONE group's arrays at a time vs all at once
arrs = eng._collect_stream(ctx)  # drain

# time just the raw device round trip: dispatch all groups then one
# device_get on c_total only vs the full pytree
for what in ("full", "totals_only"):
    t_sum = 0.0
    for _ in range(N):
        ctx = eng._dispatch_stream(items)
        pend = ctx[4]
        t0 = time.perf_counter()
        if what == "full":
            jax.device_get(pend)
        else:
            jax.device_get([p.c_total for p in pend])
        t_sum += time.perf_counter() - t0
        # drain the rest so the next iteration isn't queued behind it
        jax.device_get(pend)
    print(f"fetch {what}: {t_sum/N*1e3:.1f} ms", flush=True)

# device-only: time a chained double-dispatch to estimate pure compute
t0 = time.perf_counter()
for _ in range(N):
    ctx = eng._dispatch_stream(items)
    jax.device_get([p.c_total for p in ctx[4]])
print(f"dispatch+totals roundtrip: {(time.perf_counter()-t0)/N*1e3:.1f} ms")
