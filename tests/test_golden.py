"""Golden-data integration tests (mirrors reference
tests/test_comprehensive.py:65-98,193-223): the bundled L78833 BRCA1 region
x 3 D17S markers must produce exactly one hit with default parameters, in
the exact 5-field output format."""

import pytest

import merpcr_tpu
from .conftest import GOLDEN_FA, GOLDEN_LINE, GOLDEN_STS, needs_golden, run_search

pytestmark = [pytest.mark.integration, needs_golden]


@pytest.fixture(scope="module")
def engine():
    eng = merpcr_tpu.MerPCR()
    assert eng.load_sts_file(GOLDEN_STS)
    return eng


def test_golden_hit(engine):
    records = engine.load_fasta_file(GOLDEN_FA)
    assert len(records) == 1
    assert records[0].label == "L78833"
    assert len(records[0].sequence) == 117143
    out = run_search(engine, records)
    assert out == GOLDEN_LINE + "\n"
    assert engine.total_hits == 1


def test_golden_output_format(engine):
    records = engine.load_fasta_file(GOLDEN_FA)
    out = run_search(engine, records)
    fields = out.strip().split("\t")
    assert len(fields) == 5
    label, pos, sts_id, alias, direct = fields
    assert label == "L78833"
    assert pos == "75823..76023"
    assert sts_id == "AFM248yg9"
    assert direct == "(-)"


def test_sts_load_counts(engine):
    # 3 STS lines -> 6 searchable records (forward + reverse each), mirroring
    # reference engine.py:253-281 dual-record construction.
    assert len(engine.sts_records) == 6


def test_margin_monotonicity():
    # More margin can only add hits (reference test_comprehensive.py:225-240)
    counts = []
    for margin in (0, 50, 500):
        eng = merpcr_tpu.MerPCR(margin=margin)
        assert eng.load_sts_file(GOLDEN_STS)
        records = eng.load_fasta_file(GOLDEN_FA)
        counts.append(len(run_search(eng, records).splitlines()))
    assert counts == sorted(counts)


def test_output_file_and_stdout_string(tmp_path, engine):
    records = engine.load_fasta_file(GOLDEN_FA)
    # literal "stdout" (any case) means stdout (reference engine.py:368-371)
    out = run_search(engine, records)
    p = tmp_path / "out.txt"
    engine.search(records, str(p))
    assert p.read_text() == out
