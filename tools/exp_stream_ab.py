"""A/B experiment: diagnose the scaffolds_3000 stream regression.

Runs the exact bench scaffolds workload (30 Mbp / 1000 STS / 3000
records) under combinations of {stream tile length} x {gap capacity
terms on/off}, plus the single-record control, and prints one line per
cell. TPU-only diagnostic; not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from merpcr_tpu.engine import MerPCR

_orig_base = MerPCR._base_config
GAPS_OFF = {"v": False}


def _patched(self, *a, **kw):
    if GAPS_OFF["v"]:
        kw["gaps_per_tile"] = 0.0
    return _orig_base(self, *a, **kw)


MerPCR._base_config = _patched


def cell(name, tile=None, gaps=True, **cfg):
    GAPS_OFF["v"] = not gaps
    if tile:
        os.environ["MERPCR_TPU_TILE_LEN"] = str(tile)
    else:
        os.environ.pop("MERPCR_TPU_TILE_LEN", None)
    t0 = time.perf_counter()
    res = bench.run_config(repeat=3, **cfg)
    dt = time.perf_counter() - t0
    d = res["detail"]
    print(
        f"{name:34s} {res['value']:>8} Mbp/s best={d['best_s']}"
        f" all={d['all_s']} warm={d['warmup_s']} rescans={d['rescans']}"
        f" total={dt:.1f}s",
        flush=True,
    )


SC = dict(mbp=30.0, nsts=1000, records=3000)
cell("scaffolds HEAD (2^21, gaps on)", **SC)
cell("scaffolds 2^23, gaps on", tile=1 << 23, **SC)
cell("scaffolds HEAD gaps OFF", gaps=False, **SC)
cell("scaffolds 2^23 gaps OFF", tile=1 << 23, gaps=False, **SC)
cell("single-record 30 Mbp control", mbp=30.0, nsts=1000, records=1)
