"""CLI tests (mirrors reference tests/test_cli.py, test_cli_enhanced.py,
test_module_entry_point.py)."""

import os
import subprocess
import sys

import pytest

from merpcr_tpu.cli import (
    convert_mepcr_arguments,
    create_parser,
    main,
    margin_type,
    mismatch_type,
    pcr_size_type,
    threads_type,
    wordsize_type,
)
from .conftest import GOLDEN_FA, GOLDEN_LINE, GOLDEN_STS, needs_golden

pytestmark = pytest.mark.cli


class TestArgConversion:
    # reference cli.py:19-62 conversion matrix
    @pytest.mark.parametrize("inp,expected", [
        (["M=50"], ["-M", "50"]),
        (["N=2"], ["-N", "2"]),
        (["W=11"], ["-W", "11"]),
        (["X=3"], ["-X", "3"]),
        (["T=4"], ["-T", "4"]),
        (["Q=0"], ["-Q", "0"]),
        (["Z=240"], ["-Z", "240"]),
        (["I=1"], ["-I", "1"]),
        (["S=1022"], ["-S", "1022"]),
        (["O=out.txt"], ["-O", "out.txt"]),
        (["P=5"], []),  # Mac priority key silently dropped (cli.py:51-53)
        (["-help"], ["--help"]),
        (["sts.txt", "fa.fa", "M=50"], ["sts.txt", "fa.fa", "-M", "50"]),
        (["-M", "50"], ["-M", "50"]),  # modern style untouched
        (["M="], ["M="]),  # too short to be K=V (len < 3)
        (["A=5"], ["A=5"]),  # unknown key untouched
    ])
    def test_convert(self, inp, expected):
        assert convert_mepcr_arguments(inp) == expected


class TestValidators:
    # reference cli.py:79-124 bounds
    def test_bounds(self):
        import argparse

        assert margin_type("0") == 0 and margin_type("10000") == 10000
        assert mismatch_type("10") == 10
        assert wordsize_type("3") == 3 and wordsize_type("16") == 16
        assert threads_type("1") == 1
        assert pcr_size_type("1") == 1
        for fn, bad in [
            (margin_type, "-1"), (margin_type, "10001"),
            (mismatch_type, "11"), (wordsize_type, "2"),
            (wordsize_type, "17"), (threads_type, "0"),
            (pcr_size_type, "0"), (pcr_size_type, "10001"),
        ]:
            with pytest.raises(argparse.ArgumentTypeError):
                fn(bad)


class TestParser:
    def test_defaults(self):
        args = create_parser().parse_args(["s.sts", "f.fa"])
        assert args.margin == 50 and args.wordsize == 11
        assert args.mismatches == 0 and args.three_prime_match == 1
        assert args.quiet == 1 and args.iupac == 0
        assert args.default_pcr_size == 240 and args.threads == 1
        assert args.max_sts_line_length == 1022 and args.output is None


@needs_golden
class TestMainInProcess:
    def test_golden_run(self, capsys):
        rc = main([GOLDEN_STS, GOLDEN_FA])
        captured = capsys.readouterr()
        assert rc == 0
        assert captured.out == GOLDEN_LINE + "\n"

    def test_missing_sts(self, tmp_path):
        fa = tmp_path / "f.fa"
        fa.write_text(">s\nACGT\n")
        rc = main([str(tmp_path / "nope.sts"), str(fa)])
        assert rc == 1

    def test_missing_fasta(self, tmp_path):
        rc = main([GOLDEN_STS, str(tmp_path / "nope.fa")])
        assert rc == 1

    def test_output_file(self, tmp_path):
        out = tmp_path / "o.txt"
        rc = main([GOLDEN_STS, GOLDEN_FA, "-O", str(out)])
        assert rc == 0
        assert out.read_text() == GOLDEN_LINE + "\n"

    def test_legacy_args(self, capsys):
        rc = main([GOLDEN_STS, GOLDEN_FA, "M=50", "N=0", "Q=1"])
        assert rc == 0
        assert capsys.readouterr().out == GOLDEN_LINE + "\n"


@needs_golden
@pytest.mark.slow
class TestSubprocess:
    def _env(self):
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        if os.environ.get("MERPCR_TEST_BACKEND", "cpu") == "cpu":
            env["MERPCR_TPU_PLATFORM"] = "cpu"
        return env

    def test_module_entry(self):
        r = subprocess.run(
            [sys.executable, "-m", "merpcr_tpu", GOLDEN_STS, GOLDEN_FA],
            capture_output=True, text=True, env=self._env(), timeout=600,
        )
        assert r.returncode == 0
        assert r.stdout == GOLDEN_LINE + "\n"
        # diagnostics (if any) go to stderr, results to stdout
        assert GOLDEN_LINE not in r.stderr

    def test_version(self):
        r = subprocess.run(
            [sys.executable, "-m", "merpcr_tpu", "--version"],
            capture_output=True, text=True, env=self._env(), timeout=120,
        )
        assert r.returncode == 0
        assert "1.3.0" in r.stdout

    def test_verbose_to_stderr(self):
        r = subprocess.run(
            [sys.executable, "-m", "merpcr_tpu", GOLDEN_STS, GOLDEN_FA, "-Q", "0"],
            capture_output=True, text=True, env=self._env(), timeout=600,
        )
        assert r.returncode == 0
        assert "Reading STS file" in r.stderr
        assert r.stdout == GOLDEN_LINE + "\n"
