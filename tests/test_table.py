"""Table-compiler invariants, including the dense-set stride-group build.

The dense branch (ops/table.py: repeat-LUT + tiling) only runs when
stride * 4^(span-W) * n_unique > 2^21 — i.e. > 8192 unique keys at W=11,
stride 4 — which no other test or fuzz case reaches. It guards
output-byte-equality invariant #1, so it gets a first-principles check
here: for sampled span values v, the group bit must equal
"any phase d has (v >> 2d) & mask(2W) in the key set", and each ptab
phase bit must match its phase's membership exactly.
"""

import os
import random
import tempfile

import numpy as np
import pytest

from merpcr_tpu.io.sts import STSLoader
from merpcr_tpu.ops.table import compile_table


def _build(n_sts: int, wordsize: int):
    rng = random.Random(5)
    with tempfile.TemporaryDirectory() as td:
        sp = os.path.join(td, "t.sts")
        with open(sp, "w") as fh:
            for i in range(n_sts):
                p1 = "".join(rng.choices("ACGT", k=22))
                p2 = "".join(rng.choices("ACGT", k=22))
                fh.write(f"S{i}\t{p1}\t{p2}\t{rng.randrange(100, 400)}\n")
        res = STSLoader.load_file(sp, wordsize, 240)
    table, meta = compile_table(res, wordsize, False)
    return res, table, meta


def _check_group_tables(res, table, meta, wordsize):
    from merpcr_tpu.ops.table import _lsb_keys

    stride = meta.stride
    span = wordsize + stride - 1
    mask = (1 << (2 * wordsize)) - 1
    keyset = set(int(k) for k in _lsb_keys(res.hashes, wordsize))
    qbloom = np.asarray(table.qbloom)
    ptab = np.asarray(table.ptab)
    NPS = 5 - (stride.bit_length() - 1)

    rng = random.Random(6)
    samples = [rng.randrange(1 << (2 * span)) for _ in range(4000)]
    # planted positives: every key at every phase with random context
    keys = list(keyset)[:500]
    for k in keys:
        for d in range(stride):
            pre = rng.randrange(1 << (2 * d)) if d else 0
            nsuf = 2 * span - 2 * (d + wordsize)
            suf = rng.randrange(1 << nsuf) if nsuf else 0
            samples.append(pre | (k << (2 * d)) | (suf << (2 * (d + wordsize))))

    for v in samples:
        phases = [
            d for d in range(stride) if ((v >> (2 * d)) & mask) in keyset
        ]
        got_any = (int(qbloom[v >> 5]) >> (v & 31)) & 1
        assert got_any == (1 if phases else 0), (v, phases)
        word = int(ptab[v >> NPS])
        nb = (word >> ((v & ((1 << NPS) - 1)) * stride)) & ((1 << stride) - 1)
        expect_nb = sum(1 << d for d in phases)
        assert nb == expect_nb, (v, phases, nb)


@pytest.mark.unit
class TestDenseGroupTables:
    def test_dense_branch_w11(self):
        # 9000 lines -> ~17800 unique keys >> 8192: dense repeat/tile branch
        res, table, meta = _build(9000, 11)
        assert meta.exact_group and meta.stride == 4
        assert meta.n_unique > 8192
        _check_group_tables(res, table, meta, 11)

    def test_sparse_branch_w11(self):
        # small set -> scatter branch; same invariant must hold
        res, table, meta = _build(40, 11)
        assert meta.exact_group and meta.stride == 4
        _check_group_tables(res, table, meta, 11)

    def test_stride2_layout_w12(self):
        # W=12 -> stride 2 (sparse scatter branch at this size; the dense
        # W=12 branch needs >262k unique keys, impractical in a test) —
        # validates the 2-bit-per-value ptab word layout
        res, table, meta = _build(3000, 12)
        assert meta.exact_group and meta.stride == 2
        _check_group_tables(res, table, meta, 12)
