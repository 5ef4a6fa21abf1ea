"""Native C++ codec vs NumPy fallback equivalence."""

import numpy as np
import pytest

from merpcr_tpu.native import fasta_filter, get_lib, nibble_pack
from merpcr_tpu.ops.encoding import FASTA_KEEP, NIB_LUT

pytestmark = pytest.mark.unit


def _rand_bytes(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, n, dtype=np.uint8)


import shutil


@pytest.mark.skipif(
    shutil.which("g++") is None,
    reason="no g++ toolchain (NumPy fallback covers functionality)",
)
def test_native_lib_builds():
    assert get_lib() is not None, "g++ codec should build when g++ exists"


@pytest.mark.parametrize("n", [0, 1, 7, 1000, 65537])
def test_filter_matches_numpy(n):
    raw = _rand_bytes(n, seed=n)
    expect = raw[FASTA_KEEP[raw]]
    got = fasta_filter(raw, FASTA_KEEP)
    assert np.array_equal(got, expect)


@pytest.mark.parametrize("n", [0, 2, 9, 1001, 65536])
def test_pack_matches_numpy(n):
    rng = np.random.default_rng(n)
    alpha = np.frombuffer(b"ACGTBDHKMNRSVWXYacgtbdhkmnrsvwxy", dtype=np.uint8)
    seq = rng.choice(alpha, size=n)
    got = nibble_pack(seq, NIB_LUT)
    nib = NIB_LUT[seq]
    if len(nib) % 2:
        nib = np.concatenate([nib, np.zeros(1, np.uint8)])
    expect = (nib[0::2] | (nib[1::2] << 4)).astype(np.uint8)
    assert got is not None and np.array_equal(got, expect)


def test_pack_rejects_out_of_alphabet():
    seq = np.frombuffer(b"ACGTEACGTA", dtype=np.uint8)  # 'E' not in alphabet
    assert nibble_pack(seq, NIB_LUT) is None
