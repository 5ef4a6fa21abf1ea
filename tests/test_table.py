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

    # the group table may be host-truncated (q_bits < 2*span): its key is
    # then the span value's LOW q_bits, and the bit is the OR over every
    # completion of the dropped top bases — a strict superset filter
    truncated = meta.q_bits < 2 * span
    qmask = (1 << meta.q_bits) - 1
    assert len(qbloom) * 32 == 1 << meta.q_bits

    for v in samples:
        phases = [
            d for d in range(stride) if ((v >> (2 * d)) & mask) in keyset
        ]
        vq = v & qmask
        got_any = (int(qbloom[vq >> 5]) >> (vq & 31)) & 1
        if truncated:
            # no false negatives allowed; false positives are by design
            assert not (phases and not got_any), (v, phases)
        else:
            assert got_any == (1 if phases else 0), (v, phases)
        # ptab is build-time folded: its bit for (folded value, phase d)
        # is the OR over completions of the dropped top span bases —
        # identity for phases whose key fits the folded bases (all but
        # the last), a 4x over-approximation for the last phase
        pbits_log = (len(ptab) * 32 // stride).bit_length() - 1
        vf = v & ((1 << pbits_log) - 1)
        word = int(ptab[vf >> NPS])
        nb = (word >> ((vf & ((1 << NPS) - 1)) * stride)) & ((1 << stride) - 1)
        expect_nb = 0
        for d in range(stride):
            if 2 * (d + wordsize) <= pbits_log:
                hit = ((v >> (2 * d)) & mask) in keyset
            else:
                hit = any(
                    (((vf | (b << pbits_log)) >> (2 * d)) & mask) in keyset
                    for b in range(1 << (2 * span - pbits_log))
                )
            expect_nb |= (1 << d) if hit else 0
        assert nb == expect_nb, (v, phases, nb, expect_nb)


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


@pytest.mark.unit
class TestGroupTableTruncation:
    def test_fold_is_quarter_or(self):
        """One fold: bit[v'] == OR over b of bit[v' | b << (bits-2)]."""
        from merpcr_tpu.ops.table import _truncate_group_table

        rng = np.random.default_rng(7)
        bits = 28
        # sparse bitmap so folding passes the density rule
        tab = np.zeros((1 << bits) // 32, dtype=np.uint32)
        vals = rng.integers(0, 1 << bits, 5000, dtype=np.int64)
        np.bitwise_or.at(
            tab, vals >> 5, np.uint32(1) << (vals & 31).astype(np.uint32)
        )
        out, obits, dens = _truncate_group_table(tab.copy(), bits)
        assert obits == 26  # GQ_TARGET_BITS
        q = tab.reshape(4, -1)
        want = (q[0] | q[1]) | (q[2] | q[3])
        assert np.array_equal(out, want)
        assert 0 < dens < 0.01
        # every original set value is still set in the folded table
        vq = vals & ((1 << obits) - 1)
        assert np.all((out[vq >> 5] >> (vq & 31).astype(np.uint32)) & 1 == 1)

    def test_dense_table_not_folded(self):
        """Folding stops when it would add > GQ_MAX_ADDED_DENSITY."""
        from merpcr_tpu.ops.table import _truncate_group_table

        rng = np.random.default_rng(8)
        bits = 28
        tab = np.zeros((1 << bits) // 32, dtype=np.uint32)
        vals = rng.integers(0, 1 << bits, 10_000_000, dtype=np.int64)
        np.bitwise_or.at(
            tab, vals >> 5, np.uint32(1) << (vals & 31).astype(np.uint32)
        )
        out, obits, dens = _truncate_group_table(tab, bits)
        assert obits == 28  # a fold would ~4x the ~3.6% density: rejected

    def test_engine_output_unchanged_by_truncation(self, tmp_path):
        """Byte-equality across table truncation: the same search with the
        full-span tables (truncation disabled via monkeypatching the fold
        away) must produce identical output."""
        import io
        from contextlib import redirect_stdout
        from unittest import mock

        import merpcr_tpu
        import merpcr_tpu.ops.table as table_mod

        rng = random.Random(17)
        g = list("".join(rng.choices("ACGT", k=40000)))
        lines = []
        for i in range(60):
            p1 = "".join(rng.choices("ACGT", k=20))
            p2 = "".join(rng.choices("ACGT", k=20))
            prod = rng.randrange(60, 300)
            lines.append(f"T{i}\t{p1}\t{p2}\t{prod}")
            if i % 2 == 0:
                pos = rng.randrange(0, len(g) - prod)
                g[pos : pos + 20] = p1
                g[pos + prod - 20 : pos + prod] = p2
        sts = tmp_path / "t.sts"
        fa = tmp_path / "t.fa"
        sts.write_text("\n".join(lines) + "\n")
        body = "".join(g)
        fa.write_text(
            ">t\n" + "\n".join(body[i : i + 70] for i in range(0, len(body), 70)) + "\n"
        )

        def run():
            eng = merpcr_tpu.MerPCR()
            assert eng.load_sts_file(str(sts))
            recs = eng.load_fasta_file(str(fa))
            buf = io.StringIO()
            with redirect_stdout(buf):
                eng.search(recs, None)
            return buf.getvalue(), eng._meta

        out_trunc, meta_t = run()
        assert meta_t.q_bits == 26 and meta_t.sq_bits == 26  # really folded
        with mock.patch.object(
            table_mod,
            "_truncate_group_table",
            side_effect=lambda tab, bits: (
                tab, bits, table_mod._popcount(tab) / float(1 << bits)
            ),
        ):
            out_full, meta_f = run()
        assert meta_f.q_bits == 28
        assert out_trunc == out_full and out_trunc.count("\n") >= 20


class TestUnitProjectionStrict:
    """First-principles checks of the unit-projection strict table
    (ops/table._build_strict): key = window bases C..C+12 of a u32 unit,
    one bit answering all 8 phases."""

    @staticmethod
    def _key_of(window16, c2bases, gq):
        """Scan-side key for a unit whose bases are window16 (0..15) +
        c2bases (16..23): bases C..C+12 LSB-first, low gq bits."""
        from merpcr_tpu.ops.table import PROJ_UNIT_START as C

        bases = list(window16) + list(c2bases)
        v = 0
        for k in range(13):
            v |= bases[C + k] << (2 * k)
        return v & ((1 << gq) - 1)

    @staticmethod
    def _bit(tab, v):
        return (int(tab[v >> 5]) >> (v & 31)) & 1

    @pytest.mark.unit
    @pytest.mark.parametrize("wordsize", [11, 14, 16])
    def test_planted_primer_flagged_at_every_phase(self, wordsize):
        """A clean window holding primer1 at phase d must set the unit
        bit, for every d in 0..7 (soundness: no lost candidates)."""
        res, table, meta = _build(20, wordsize)
        assert meta.strict
        tab = np.asarray(table.qbloom_s)
        gq = meta.sq_bits
        code = {"A": 0, "C": 1, "G": 2, "T": 3}
        rng = random.Random(7)
        for rec in (res.records[0], res.records[3]):
            p1 = [code[c] for c in rec.primer1]
            for d in range(8):
                bases = [rng.randrange(4) for _ in range(24)]
                bases[d : d + len(p1)] = p1[: 24 - d]
                key = TestUnitProjectionStrict._key_of(
                    bases[:16], bases[16:], gq
                )
                assert TestUnitProjectionStrict._bit(tab, key) == 1, (
                    wordsize, d)

    @pytest.mark.unit
    def test_extension_mismatch_not_flagged(self):
        """With a single entry pair, flipping ONE projected base of the
        planted window must clear the bit (the table is exact over the
        projection, so false positives would mean a build bug)."""
        from merpcr_tpu.ops.table import PROJ_UNIT_START as C

        rng = random.Random(11)
        with tempfile.TemporaryDirectory() as td:
            sp = os.path.join(td, "t.sts")
            p1 = "".join(rng.choices("ACGT", k=24))
            p2 = "".join(rng.choices("ACGT", k=24))
            with open(sp, "w") as fh:
                fh.write(f"S0\t{p1}\t{p2}\t200\n")
            res = STSLoader.load_file(sp, 11, 240)
        table, meta = compile_table(res, 11, False)
        assert meta.strict
        tab = np.asarray(table.qbloom_s)
        gq = meta.sq_bits
        code = {"A": 0, "C": 1, "G": 2, "T": 3}
        # both entries (forward p1, reverse p2) at all 8 phases
        planted = [
            [code[c] for c in p1],
            [code[c] for c in p2],
        ]
        hits = misses = 0
        for codes in planted:
            for d in range(8):
                bases = [0] * 24
                bases[d : d + len(codes)] = codes[: 24 - d]
                key = TestUnitProjectionStrict._key_of(
                    bases[:16], bases[16:], gq
                )
                assert TestUnitProjectionStrict._bit(tab, key) == 1
                hits += 1
                # flip one projected base that is primer-covered
                for flip_at in (C, C + 6, C + 12):
                    if not (d <= flip_at < d + len(codes)):
                        continue
                    b2 = list(bases)
                    b2[flip_at] ^= 1
                    k2 = TestUnitProjectionStrict._key_of(
                        b2[:16], b2[16:], gq
                    )
                    if TestUnitProjectionStrict._bit(tab, k2) == 0:
                        misses += 1
        # every flip must miss unless it collides with the OTHER
        # entry/phase patterns — with 16 patterns in 2^26 values,
        # require at least 90% clean misses
        assert hits == 16
        assert misses >= 40

    @pytest.mark.unit
    def test_pathological_sets_bail_to_loose(self):
        """Tiny-W short-primer sets saturate the projection and must
        disable strict mode (loose front end keeps correctness)."""
        with tempfile.TemporaryDirectory() as td:
            sp = os.path.join(td, "t.sts")
            with open(sp, "w") as fh:
                for i in range(30):
                    rng = random.Random(i)
                    p1 = "".join(rng.choices("ACGT", k=4))
                    p2 = "".join(rng.choices("ACGT", k=4))
                    fh.write(f"S{i}\t{p1}\t{p2}\t50\n")
            res = STSLoader.load_file(sp, 3, 240)
        table, meta = compile_table(res, 3, False)
        assert not meta.strict
        assert meta.t16_bits == 0
