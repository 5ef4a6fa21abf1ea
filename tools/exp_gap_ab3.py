"""Controlled A/B: current gap coefficients vs gaps-off (floor caps),
interleaved in one process to control run-to-run variance.

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

_orig_base = MerPCR._base_config
GAPS_OFF = {"v": False}


def _patched(self, *a, **kw):
    if GAPS_OFF["v"]:
        kw["gaps_per_tile"] = 0.0
    return _orig_base(self, *a, **kw)


MerPCR._base_config = _patched

td = tempfile.mkdtemp()
sts_path, fa_path, n = bench.gen_data(td, 30.0, 1000, n_records=3000)

engs = {}
for key in ("on", "off"):
    GAPS_OFF["v"] = key == "off"
    eng = merpcr_tpu.MerPCR()
    assert eng.load_sts_file(sts_path)
    recs = eng.load_fasta_file(fa_path)
    for _ in range(2):
        with redirect_stdout(io.StringIO()):
            eng.search(recs, None)
    engs[key] = (eng, recs)
    ctx = eng._dispatch_stream(eng._plan_cache[1][0][2])
    cfg = ctx[1]
    print(f"{key}: caps cpos={cfg.cpos_cap} pos={cfg.pos_cap} "
          f"cand={cfg.cand_cap} G={eng._tile_group(cfg)} "
          f"rescans={eng._rescan_count}")
    eng._collect_stream(ctx)

for rnd in range(4):
    line = []
    for key in ("on", "off"):
        GAPS_OFF["v"] = key == "off"
        eng, recs = engs[key]
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            with redirect_stdout(io.StringIO()):
                eng.search(recs, None)
            ts.append(time.perf_counter() - t0)
        line.append(f"{key}: best={min(ts)*1e3:.1f} ms "
                    f"({30.0/min(ts):.0f} Mbp/s)")
    print("  ".join(line), flush=True)
