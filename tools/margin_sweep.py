"""Margin-sweep workflow (BASELINE.json config #4: "margin sweep M=50-100").

Demonstrates the device-resident genome-plane cache: one genome, many
parameter settings — only the first search pays the host->device transfer.

Usage: python tools/margin_sweep.py STS_FILE FASTA_FILE [M_LO M_HI STEP]
"""

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import merpcr_tpu


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    sts, fa = sys.argv[1], sys.argv[2]
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    step = int(sys.argv[5]) if len(sys.argv) > 5 else 10

    records = None
    for m in range(lo, hi + 1, step):
        eng = merpcr_tpu.MerPCR(margin=m)
        if not eng.load_sts_file(sts):
            return 1
        if records is None:
            records = eng.load_fasta_file(fa)
            if not records:
                return 1
        t0 = time.perf_counter()
        buf = io.StringIO()
        with redirect_stdout(buf):
            hits = eng.search(records, None)
        print(f"M={m:5d}: {hits:6d} hits in {time.perf_counter()-t0:7.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
