"""cProfile the warm scaffolds search: where do the ~77 ms/search go?

TPU diagnostic; not part of the test suite.
"""

import cProfile
import io
import os
import pstats
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import merpcr_tpu

td = tempfile.mkdtemp()
sts_path, fa_path, n = bench.gen_data(td, 30.0, 1000, n_records=3000)
eng = merpcr_tpu.MerPCR()
assert eng.load_sts_file(sts_path)
recs = eng.load_fasta_file(fa_path)

for _ in range(2):  # compile + warm
    with redirect_stdout(io.StringIO()):
        eng.search(recs, None)

N = 20
t0 = time.perf_counter()
for _ in range(N):
    with redirect_stdout(io.StringIO()):
        eng.search(recs, None)
per = (time.perf_counter() - t0) / N
print(f"warm search: {per*1e3:.1f} ms  ({30.0/per:.0f} Mbp/s)", flush=True)

pr = cProfile.Profile()
pr.enable()
for _ in range(N):
    with redirect_stdout(io.StringIO()):
        eng.search(recs, None)
pr.disable()
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
ps.print_stats(35)
print(s.getvalue())
