"""Per-iteration warm-search times for the scaffolds workload: does the
warm search degrade across iterations (cache growth? device state?), and
where does a single search's wall time go (dispatch vs fetch)?

TPU diagnostic; not part of the test suite.
"""

import io
import os
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import merpcr_tpu
from merpcr_tpu.engine import MerPCR

td = tempfile.mkdtemp()
sts_path, fa_path, n = bench.gen_data(td, 30.0, 1000, n_records=3000)
eng = merpcr_tpu.MerPCR()
assert eng.load_sts_file(sts_path)
recs = eng.load_fasta_file(fa_path)

times = []
for i in range(24):
    t0 = time.perf_counter()
    with redirect_stdout(io.StringIO()):
        eng.search(recs, None)
    times.append(time.perf_counter() - t0)
print("per-iter ms:", [round(t * 1e3, 1) for t in times], flush=True)

# stage split: dispatch vs fetch for one search-equivalent
items_plan = None
t0 = time.perf_counter()
ctx = None
# mimic search's stream path directly
plan = eng._plan_of(recs) if hasattr(eng, "_plan_of") else None
print("plan helper:", plan is not None)

# direct dispatch/collect timing
for _ in range(3):
    t0 = time.perf_counter()
    # reuse engine internals: find the stream run from the cached plan
    # (private API poke, diagnostic only)
    t_d = t_c = 0.0
    t0 = time.perf_counter()
    with redirect_stdout(io.StringIO()):
        eng.search(recs, None)
    print(f"search: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
