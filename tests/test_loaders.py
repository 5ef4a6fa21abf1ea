"""Loader behavior tests (mirrors reference tests/test_io_modules.py and the
STS edge cases in test_core_engine_comprehensive.py)."""

import numpy as np
import pytest

import merpcr_tpu
from merpcr_tpu.io.fasta import FASTALoader
from merpcr_tpu.io.sts import STSLoader, _parse_pcr_size

pytestmark = pytest.mark.unit

P1 = "GGCTCAGAGTATTTGGGATG"
P2 = "CTCTTGGAATCCTATCTCACTG"


class TestFASTA:
    def test_basic_and_multiline(self, tmp_fa):
        path = tmp_fa(">seq1 desc here\nACGTACGT\nGGCC\n\n>seq2\nTTTT\n")
        recs = FASTALoader.load_file(path)
        assert len(recs) == 2
        assert recs[0].label == "seq1"
        assert recs[0].sequence == "ACGTACGTGGCC"
        assert recs[1].sequence == "TTTT"

    def test_char_filter_keeps_case(self, tmp_fa):
        # reference fasta.py:60: keep ACGTBDHKMNRSVWXY (any case), drop rest
        path = tmp_fa(">s\nAcG 12tN-ryE\n")
        recs = FASTALoader.load_file(path)
        assert recs[0].sequence == "AcGtNry"

    def test_empty_file(self, tmp_fa):
        assert FASTALoader.load_file(tmp_fa("")) == []

    def test_no_defline_ignored(self, tmp_fa):
        # sequence lines before any '>' are dropped (no open record)
        recs = FASTALoader.load_file(tmp_fa("ACGT\n>s\nGGGG\n"))
        assert len(recs) == 1
        assert recs[0].sequence == "GGGG"


class TestSTS:
    def test_dual_records_per_line(self, tmp_sts):
        res = STSLoader.load_file(tmp_sts(f"S1\t{P1}\t{P2}\t201\tali\n"), 11, 240)
        assert res.ok and len(res.records) == 2
        fwd, rev = res.records
        assert (fwd.direct, rev.direct) == ("+", "-")
        assert fwd.primer1 == P1 and fwd.primer2 == P2
        # reverse record: primer1 = p2 as written, primer2 = revcomp(p1)
        # (reference engine.py:272-279)
        assert rev.primer1 == P2
        from merpcr_tpu.utils import reverse_complement
        assert rev.primer2 == reverse_complement(P1)
        assert fwd.offset == rev.offset == 1

    def test_bad_line_fails_whole_load(self, tmp_sts):
        res = STSLoader.load_file(
            tmp_sts(f"S1\t{P1}\t{P2}\t201\nBAD LINE NO TABS\n"), 11, 240
        )
        assert not res.ok and res.records == []

    def test_comments_blank_lines_and_line_numbers(self, tmp_sts):
        res = STSLoader.load_file(
            tmp_sts(f"# comment\n\nS1\t{P1}\t{P2}\t201\n"), 11, 240
        )
        assert res.ok and res.records[0].offset == 3  # counts all lines

    def test_short_primer_dropped(self, tmp_sts):
        res = STSLoader.load_file(
            tmp_sts(f"S1\tACGTACGT\t{P2}\t201\nS2\t{P1}\t{P2}\t201\n"), 11, 240
        )
        assert res.ok
        assert res.bad_primers_short == 1
        assert len(res.records) == 2  # only S2

    def test_ambig_primer_dropped_per_direction(self, tmp_sts):
        amb = "N" * 20
        res = STSLoader.load_file(tmp_sts(f"S1\t{amb}\t{P2}\t201\n"), 11, 240)
        # forward keyed on primer1(=ambig) dropped; reverse keyed on
        # primer2 survives (reference engine.py:264-281)
        assert res.bad_primers_ambig == 1
        assert len(res.records) == 1 and res.records[0].direct == "-"

    def test_pcr_size_clamp(self, tmp_sts):
        res = STSLoader.load_file(tmp_sts(f"S1\t{P1}\t{P2}\t10\n"), 11, 240)
        assert res.bad_pcr_size == 1
        assert res.records[0].pcr_size == len(P1) + len(P2)

    def test_primers_uppercased(self, tmp_sts):
        res = STSLoader.load_file(
            tmp_sts(f"S1\t{P1.lower()}\t{P2.lower()}\t201\n"), 11, 240
        )
        assert res.records[0].primer1 == P1

    def test_alias_and_missing_alias(self, tmp_sts):
        res = STSLoader.load_file(
            tmp_sts(f"S1\t{P1}\t{P2}\t201\tTheAlias\nS2\t{P1}\t{P2}\t201\n"),
            11, 240,
        )
        assert res.records[0].alias == "TheAlias"
        assert res.records[2].alias == ""

    def test_empty_file(self, tmp_sts):
        assert not STSLoader.load_file(tmp_sts(""), 11, 240).ok


class TestParsePCRSize:
    # reference engine.py:304-322
    def test_plain(self):
        assert _parse_pcr_size("150", 240) == 150

    def test_range_average(self):
        assert _parse_pcr_size("100-200", 240) == 150
        assert _parse_pcr_size("101-200", 240) == 150  # floor division

    def test_bad_values_default(self):
        for s in ["", "abc", "0", "-5", "100-", "-100", "50-60-70", "a-b"]:
            assert _parse_pcr_size(s, 240) == 240


class TestBatchHash:
    """The loader's batched first-valid-W-mer hash must equal the scalar
    implementation (ops.encoding.hash_value_bytes) on every row shape."""

    def test_matches_scalar_randomized(self):
        import random

        from merpcr_tpu.io.sts import _batch_hash
        from merpcr_tpu.ops.encoding import encode_bytes, hash_value_bytes

        rng = random.Random(99)
        alphabet = "ACGTacgtNnRYKMSWBDHVUu*?xz"
        prims = []
        for _ in range(300):
            L = rng.randrange(11, 30)
            prims.append("".join(rng.choice(alphabet) for _ in range(L)))
        # fixed corner rows: clean, all-ambiguous, valid window only at end
        prims += ["A" * 11, "N" * 15, "N" * 7 + "ACGTACGTACG", "acgtacgtacg"]
        for W in (3, 11, 16):
            lens = np.array([len(p) for p in prims], dtype=np.int64)
            Lmax = int(lens.max())
            j = np.arange(Lmax)
            inrow = j[None, :] < lens[:, None]
            pad = np.zeros((len(prims), Lmax), dtype=np.uint8)
            pad[inrow] = encode_bytes("".join(prims))
            offs, hs = _batch_hash(pad, inrow, W)
            for i, p in enumerate(prims):
                o_ref, h_ref = hash_value_bytes(encode_bytes(p), W)
                assert offs[i] == o_ref, (W, p)
                assert hs[i] == h_ref, (W, p)


class TestFASTASegmentParser:
    """The vectorized segment parser must equal the reference-shaped line
    loop on adversarial inputs (whitespace-led deflines, mid-line '>',
    CRLF, no trailing newline, junk before the first defline, …)."""

    def test_parsers_equivalent(self):
        import random

        from merpcr_tpu.io.fasta import _parse_lines, _parse_segments

        rng = random.Random(11)
        cases = [
            b"",
            b">a\nACGT\n",
            b">a\nACGT",
            b"ACGT\n>a\nGGTT\n",
            b">a desc here\nAC GT\n\n\nGG>TT\n>b\nTTTT\n",
            b"   >ws defline\r\nacgtNRY\r\n\t>tab defline\nGGGG\n",
            b">empty1\n>empty2\n>c\nAAAA\n",
            b">only defline",
            b"\n\n>x\n\nACGT\n  TTTT  \n",
            b">a\n0123!@#EFIJLOPQUZacgt\n",
        ]
        for _ in range(60):
            parts = []
            for _ in range(rng.randrange(1, 12)):
                r = rng.random()
                if r < 0.3:
                    parts.append(b">" + bytes(
                        rng.choices(b"abc >\tdef", k=rng.randrange(0, 10))))
                elif r < 0.4:
                    parts.append(
                        bytes(rng.choices(b" \t\r", k=rng.randrange(0, 3)))
                        + b">x" + bytes(rng.choices(b"abc", k=3)))
                else:
                    parts.append(bytes(rng.choices(
                        b"ACGTNRYKacgtu*>x 0\t\r", k=rng.randrange(0, 40))))
            cases.append(
                b"\n".join(parts) + (b"\n" if rng.random() < 0.5 else b"")
            )
        for d in cases:
            a = _parse_segments(d)
            b = _parse_lines(d)
            assert a is not None
            ka = [(r.defline, r.sequence) for r in a]
            kb = [(r.defline, r.sequence) for r in b]
            assert ka == kb, d[:80]
