"""Unit tests for the byte LUTs and primitives (mirrors reference
tests/test_utils_comprehensive.py and test_engine_internals.py coverage)."""

import numpy as np
import pytest

from merpcr_tpu.ops.encoding import (
    AMBIG,
    COMPL,
    FASTA_KEEP,
    SCODE,
    encode_bytes,
    hash_value_bytes,
    match_matrix,
    reverse_complement_bytes,
)
from merpcr_tpu.utils import hash_value, reverse_complement

pytestmark = pytest.mark.unit


def test_scode_exhaustive():
    # reference engine.py:102-109
    expected = {ord(c): v for c, v in
                [("A", 0), ("a", 0), ("C", 1), ("c", 1), ("G", 2), ("g", 2),
                 ("T", 3), ("t", 3), ("U", 3), ("u", 3)]}
    for b in range(256):
        assert SCODE[b] == expected.get(b, AMBIG)


def test_complement_pairs():
    # reference engine.py:112-135; unknown -> 'N' (engine.py:359)
    pairs = {"A": "T", "C": "G", "G": "C", "T": "A", "U": "A", "B": "V",
             "D": "H", "H": "D", "K": "M", "M": "K", "N": "N", "R": "Y",
             "S": "S", "V": "B", "W": "W", "X": "X", "Y": "R"}
    for k, v in pairs.items():
        assert chr(COMPL[ord(k)]) == v
        assert chr(COMPL[ord(k.lower())]) == v.lower()
    assert chr(COMPL[ord("Q")]) == "N"
    assert chr(COMPL[ord("7")]) == "N"


def test_reverse_complement_involution():
    s = "ACGTacgtNRYKMswbdhv"
    assert reverse_complement(reverse_complement(s)) == s
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AAGG") == "CCTT"
    # case preservation (reference engine.py:133-135)
    assert reverse_complement("aCgT") == "AcGt"


def test_hash_value_bit_math():
    # reference tests/test_engine_internals.py:26-34 semantics
    off, h = hash_value("A" * 11, 11)
    assert (off, h) == (0, 0)
    off, h = hash_value("T" * 8, 8)
    assert (off, h) == (0, 65535)
    off, h = hash_value("ACGT", 4)
    assert (off, h) == (0, (0 << 6) | (1 << 4) | (2 << 2) | 3)


def test_hash_value_first_valid_offset():
    # first ambiguity-free W-mer wins (reference engine.py:339-353)
    off, h = hash_value("NACGTACGTACGTA", 11)
    assert off == 1
    off, h = hash_value("ACGNACGTACGTACG", 11)
    assert off == 4
    off, h = hash_value("ACGTN", 4)
    assert off == 0
    assert hash_value("NNNNNNNNNNNN", 11)[0] == -1
    assert hash_value("ACGT", 11) == (-1, 0)
    # hash always < 4^W (property, reference test_property_based.py:97-114)
    for s in ["ACGTACGTACGTACGT", "TTTTTTTTTTTT", "GGGGGGGGGGGC"]:
        off, h = hash_value(s, 11)
        assert 0 <= h < 4**11


def test_fasta_keep_filter():
    # reference fasta.py:60 filter set
    for c in "ACGTBDHKMNRSVWXY":
        assert FASTA_KEEP[ord(c)] and FASTA_KEEP[ord(c.lower())]
    for c in "EFIJLOPQZ0123456789 -.*":
        assert not FASTA_KEEP[ord(c)]


def test_match_matrix_plain():
    m = match_matrix(False)
    assert m[ord("A"), ord("A")] and m[ord("A"), ord("a")]
    assert m[ord("g"), ord("G")]
    assert not m[ord("A"), ord("T")]
    assert not m[ord("N"), ord("A")]  # no IUPAC semantics when disabled
    assert m[ord("N"), ord("N")]


def test_match_matrix_iupac():
    # reference engine.py:614-629: match iff expansion sets intersect;
    # unknown chars fall back to equality.
    m = match_matrix(True)
    assert m[ord("N"), ord("A")] and m[ord("A"), ord("N")]
    assert m[ord("R"), ord("A")] and m[ord("R"), ord("G")]
    assert not m[ord("R"), ord("C")]  # R={A,G} vs C
    assert m[ord("Y"), ord("C")] and m[ord("Y"), ord("T")]
    assert m[ord("r"), ord("g")]  # case-insensitive
    assert m[ord("U"), ord("T")]  # U≡T
    # 'X' is NOT an IUPAC code in the reference mapping: equality only
    assert m[ord("X"), ord("X")]
    assert not m[ord("X"), ord("A")]
    assert not m[ord("A"), ord("X")]
    # S={C,G} W={A,T}: disjoint
    assert not m[ord("S"), ord("W")]
    assert m[ord("B"), ord("D")]  # share G,T


def test_hash_value_bytes_matches_str_api():
    for s in ["ACGTACGTACGT", "NNACGTACGTACGTNN", "acgtacgtacgt"]:
        assert hash_value(s, 11) == hash_value_bytes(encode_bytes(s), 11)


def test_reverse_complement_bytes():
    arr = encode_bytes("ACGTN")
    assert reverse_complement_bytes(arr).tobytes() == b"NACGT"


def test_iupac_exp_masks_equivalent_to_nib_match():
    """The bitmask formulation used by the packed verify stages must agree
    with nib_match_matrix for EVERY (genome nibble, primer code) pair."""
    from merpcr_tpu.ops.encoding import (
        N_PRIMER_CODES,
        iupac_exp_masks,
        nib_match_matrix,
    )

    exp_nib, exp_primer = iupac_exp_masks()
    want = nib_match_matrix(True)
    got = (exp_nib[:, None] & exp_primer[None, :]) != 0
    assert got.shape == (16, N_PRIMER_CODES)
    assert (got == (want != 0)).all()


def test_row_window_matches_element_gather():
    """_row_window (16-byte row fetch + barrel shift + nibble interleave)
    must equal the per-element nibble gather for every in-bounds window
    start, odd and even."""
    import jax.numpy as jnp
    import numpy as np

    from merpcr_tpu.ops.scan import _row_window

    rng = np.random.default_rng(9)
    TB = 1024  # positions; 512 packed bytes (multiple of 32)
    packed = rng.integers(0, 256, TB // 2).astype(np.uint8)
    n_out = 27  # odd width crosses rows

    def ref_at(p):
        idx = np.clip(p + np.arange(n_out), 0, TB - 1)
        b = packed[idx >> 1].astype(np.int64)
        return np.where((idx & 1) == 0, b & 15, b >> 4)

    starts = np.array(
        [0, 1, 2, 15, 16, 17, 31, 32, 33, 500, 501, TB - n_out - 64],
        dtype=np.int32,
    )
    got = np.asarray(_row_window(jnp.asarray(packed), TB, jnp.asarray(starts), n_out))
    for i, s in enumerate(starts):
        assert (got[i] == ref_at(int(s))).all(), s
