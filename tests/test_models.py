"""Data model tests (mirrors reference tests/test_core_models.py)."""

import pytest

from merpcr_tpu.models import FASTARecord, SeqType, STSHit, STSRecord, ThreadData

pytestmark = pytest.mark.unit


def test_sts_record_defaults():
    r = STSRecord(id="X", primer1="AAAA", primer2="TTTT", pcr_size=100)
    assert r.alias == "" and r.offset == 0 and r.hash_offset == 0
    assert r.direct == "+" and r.ambig_primer == 0


def test_fasta_label_extraction():
    # reference models.py:40-49
    assert FASTARecord(defline=">seq1 a b c", sequence="A").label == "seq1"
    assert FASTARecord(defline="noarrow x", sequence="A").label == "noarrow"
    assert FASTARecord(defline="> withspace", sequence="A").label == "withspace"
    assert FASTARecord(defline=">kept", sequence="A", label="given").label == "given"
    # reference raises IndexError on a bare '>'; we degrade to ""
    assert FASTARecord(defline=">", sequence="A").label == ""


def test_hit_and_threaddata():
    r = STSRecord(id="X", primer1="A", primer2="T", pcr_size=10)
    h = STSHit(pos1=5, pos2=15, sts=r)
    assert (h.pos1, h.pos2) == (5, 15)
    td = ThreadData(thread_id=0, sequence="ACGT", offset=0, length=4)
    assert td.hits == []


def test_seqtype_enum():
    assert SeqType.AMINO_ACID.value == 1 and SeqType.NUCLEOTIDE.value == 2
