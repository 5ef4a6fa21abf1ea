"""A/B round 2: group size x tile length for the scaffold stream.

TPU diagnostic; not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

SC = dict(mbp=30.0, nsts=1000, records=3000)


def cell(name, tile=None, limit=None, group=None):
    for k, v in (
        ("MERPCR_TPU_TILE_LEN", tile),
        ("MERPCR_TPU_GROUP_LIMIT", limit),
        ("MERPCR_TPU_TILE_GROUP", group),
    ):
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = str(v)
    # engine reads TILE_GROUP/GROUP_LIMIT at class definition: reload
    import importlib

    import merpcr_tpu.engine as E

    importlib.reload(E)
    import merpcr_tpu

    importlib.reload(merpcr_tpu)
    res = bench.run_config(repeat=3, **SC)
    d = res["detail"]
    print(
        f"{name:40s} {res['value']:>8} Mbp/s best={d['best_s']}"
        f" warm={d['warmup_s']} rescans={d['rescans']}",
        flush=True,
    )


cell("2^21 G=1 (HEAD)")
cell("2^21 G=8 (limit 8192)", limit=8192)
cell("2^21 G=15 (one program)", limit=8192, group=15)
cell("2^23 G=4 (limit 1<<20, one program)", tile=1 << 23, limit=1 << 20,
     group=4)
cell("2^22 G=8 (one program)", tile=1 << 22, limit=1 << 20, group=8)
