"""Fault injection and malformed-input tests (mirrors reference
tests/test_error_injection.py strategy: I/O failures, corrupted inputs,
recovery from mixed good/bad data)."""

import os
from unittest import mock

import pytest

import merpcr_tpu
from merpcr_tpu.cli import main
from .conftest import GOLDEN_FA, GOLDEN_STS, needs_golden, run_search

pytestmark = pytest.mark.integration

P1 = "GGCTCAGAGTATTTGGGATG"
P2 = "CTCTTGGAATCCTATCTCACTG"


class TestSTSFileErrors:
    def test_nonexistent_file_raises_to_cli(self, tmp_fa):
        fa = tmp_fa(">s\nACGT\n")
        assert main(["/nonexistent/path.sts", fa]) == 1

    def test_permission_denied(self, tmp_sts, tmp_fa):
        sts = tmp_sts(f"S1\t{P1}\t{P2}\t200\n")
        fa = tmp_fa(">s\nACGT\n")
        real_open = open

        def deny(path, *a, **k):
            if str(path) == sts:
                raise PermissionError("denied")
            return real_open(path, *a, **k)

        with mock.patch("builtins.open", side_effect=deny):
            assert main([sts, fa]) == 1

    def test_binary_garbage_sts(self, tmp_path, tmp_fa):
        p = tmp_path / "bin.sts"
        p.write_bytes(bytes(range(256)) * 4)
        fa = tmp_fa(">s\nACGT\n")
        # binary junk has no 4-field tab lines -> load fails -> exit 1
        assert main([str(p), fa]) == 1

    def test_mixed_good_bad_lines_fail_whole_load(self, tmp_sts):
        eng = merpcr_tpu.MerPCR()
        sts = tmp_sts(f"S1\t{P1}\t{P2}\t200\nnot a valid line\n")
        assert eng.load_sts_file(sts) is False
        assert eng.sts_records == []


class TestFASTAErrors:
    def test_nonexistent_fasta(self, tmp_sts):
        sts = tmp_sts(f"S1\t{P1}\t{P2}\t200\n")
        assert main([sts, "/nonexistent/genome.fa"]) == 1

    def test_empty_fasta(self, tmp_sts, tmp_fa):
        sts = tmp_sts(f"S1\t{P1}\t{P2}\t200\n")
        fa = tmp_fa("")
        assert main([sts, fa]) == 1  # loader returns [] -> exit 1

    def test_fasta_only_garbage_chars(self, tmp_sts, tmp_fa):
        eng = merpcr_tpu.MerPCR()
        eng.load_sts_file(tmp_sts(f"S1\t{P1}\t{P2}\t200\n"))
        recs = eng.load_fasta_file(tmp_fa(">s\n0123456789!@#$\n"))
        assert len(recs) == 1 and recs[0].sequence == ""
        assert run_search(eng, recs) == ""


@needs_golden
class TestOutputErrors:
    def test_unwritable_output_file(self):
        rc = main([GOLDEN_STS, GOLDEN_FA, "-O", "/nonexistent_dir/out.txt"])
        assert rc == 1

    def test_output_write_failure_mid_search(self, tmp_path):
        eng = merpcr_tpu.MerPCR()
        assert eng.load_sts_file(GOLDEN_STS)
        recs = eng.load_fasta_file(GOLDEN_FA)
        out = tmp_path / "o.txt"
        with mock.patch("builtins.print", side_effect=OSError("disk full")):
            with pytest.raises(OSError):
                eng.search(recs, str(out))
