"""Performance smoke thresholds (mirrors reference tests/test_performance.py
structure; generous CI-safe bounds — the real perf tracking is bench.py)."""

import io
import time
from contextlib import redirect_stdout

import numpy as np
import pytest

import merpcr_tpu

pytestmark = pytest.mark.performance

P1 = "GGCTCAGAGTATTTGGGATG"
P2 = "CTCTTGGAATCCTATCTCACTG"


def test_sts_load_speed(tmp_path):
    rng = np.random.default_rng(0)
    lines = []
    for i in range(1000):
        a = "".join(rng.choice(list("ACGT"), size=22))
        b = "".join(rng.choice(list("ACGT"), size=22))
        lines.append(f"S{i}\t{a}\t{b}\t{150 + i % 200}")
    sts = tmp_path / "big.sts"
    sts.write_text("\n".join(lines) + "\n")
    eng = merpcr_tpu.MerPCR()
    t0 = time.time()
    assert eng.load_sts_file(str(sts))
    assert time.time() - t0 < 5.0
    assert len(eng.sts_records) == 2000


def test_search_100kb(tmp_path):
    rng = np.random.default_rng(1)
    g = "".join(rng.choice(list("ACGT"), size=100_000))
    fa = tmp_path / "g.fa"
    fa.write_text(f">g\n{g}\n")
    sts = tmp_path / "s.sts"
    sts.write_text(f"S1\t{P1}\t{P2}\t200\n")
    eng = merpcr_tpu.MerPCR()
    eng.load_sts_file(str(sts))
    recs = eng.load_fasta_file(str(fa))
    buf = io.StringIO()
    with redirect_stdout(buf):
        eng.search(recs, None)  # warm/compile
    t0 = time.time()
    with redirect_stdout(buf):
        eng.search(recs, None)
    assert time.time() - t0 < 10.0


def test_length_scaling(tmp_path):
    """Warm-path time must scale sub-linearly x2 vs a 10x length increase
    (reference test_performance.py:254-265 allows ratio < 2x size ratio)."""
    rng = np.random.default_rng(2)
    sts = tmp_path / "s.sts"
    sts.write_text(f"S1\t{P1}\t{P2}\t200\n")

    def timed(n):
        g = "".join(rng.choice(list("ACGT"), size=n))
        fa = tmp_path / f"g{n}.fa"
        fa.write_text(f">g\n{g}\n")
        eng = merpcr_tpu.MerPCR()
        eng._tile_len_override = 1 << 15
        eng.load_sts_file(str(sts))
        recs = eng.load_fasta_file(str(fa))
        buf = io.StringIO()
        with redirect_stdout(buf):
            eng.search(recs, None)
        t0 = time.time()
        with redirect_stdout(buf):
            eng.search(recs, None)
        return time.time() - t0

    t_small = timed(1 << 15)
    t_big = timed(10 * (1 << 15))
    assert t_big < max(t_small, 0.05) * 20 * 2
