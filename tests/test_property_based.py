"""Property-based tests (mirrors reference tests/test_property_based.py;
hypothesis optional — skipped when unavailable)."""

import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:
    HAVE_HYPOTHESIS = False

from merpcr_tpu.cli import convert_mepcr_arguments
from merpcr_tpu.utils import hash_value, reverse_complement

pytestmark = [
    pytest.mark.unit,
    pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed"),
]

if HAVE_HYPOTHESIS:
    # NB: 'U' is deliberately absent — the complement map sends U -> A -> T,
    # so revcomp is an involution on the IUPAC alphabet WITHOUT U
    # (reference engine.py:112-135)
    dna = st.text(alphabet="ACGTacgtBDHKMNRSVWXYbdhkmnrsvwxy", max_size=200)
    strict_dna = st.text(alphabet="ACGT", min_size=0, max_size=200)

    @given(strict_dna)
    @settings(max_examples=200, deadline=None)
    def test_revcomp_involution(s):
        assert reverse_complement(reverse_complement(s)) == s
        assert len(reverse_complement(s)) == len(s)

    @given(dna)
    @settings(max_examples=200, deadline=None)
    def test_revcomp_known_alphabet_involution(s):
        # involution holds on the full IUPAC alphabet too (complement map
        # is an involution on it, reference engine.py:112-135)
        assert reverse_complement(reverse_complement(s)) == s

    dna_u = st.text(alphabet="ACGTUacgtuBDHKMNRSVWXYbdhkmnrsvwxy", max_size=200)

    @given(dna_u, st.integers(min_value=3, max_value=16))
    @settings(max_examples=300, deadline=None)
    def test_hash_range(s, w):
        off, h = hash_value(s, w)
        if off >= 0:
            assert 0 <= h < 4**w
            assert 0 <= off <= len(s) - w
            window = s[off : off + w].upper()
            assert all(c in "ACGTU" for c in window)
            # every earlier window must contain an ambiguity
            for o in range(off):
                assert any(
                    c.upper() not in "ACGTU" for c in s[o : o + w]
                )
        else:
            assert h == 0

    @given(st.lists(st.text(min_size=0, max_size=12), max_size=8))
    @settings(max_examples=200, deadline=None)
    def test_arg_converter_total(args):
        # converter never crashes and passes unknown args through
        out = convert_mepcr_arguments(args)
        assert isinstance(out, list)

    @given(st.integers(min_value=0, max_value=10000))
    @settings(max_examples=50, deadline=None)
    def test_arg_converter_roundtrip(v):
        assert convert_mepcr_arguments([f"M={v}"]) == ["-M", str(v)]
