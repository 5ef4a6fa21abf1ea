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

    # ---- engine-level properties (device pipeline vs Python models) ----

    import io as _io
    import os as _os
    import random as _random
    from contextlib import redirect_stdout as _redirect

    import merpcr_tpu as _pkg

    def _search_lines(eng, recs):
        buf = _io.StringIO()
        with _redirect(buf):
            eng.search(recs, None)
        return buf.getvalue().splitlines()

    def _mk_engine(tmp, sts_text, **params):
        p = _os.path.join(tmp, "p.sts")
        with open(p, "w") as fh:
            fh.write(sts_text)
        eng = _pkg.MerPCR(**params)
        assert eng.load_sts_file(p)
        return eng

    W = 11
    PLEN = 20  # fixed primer length -> one compiled verify program

    @given(
        st.lists(  # primer1 mutations, only PAST the W-mer (the scan
            st.integers(min_value=W, max_value=PLEN - 1),  # anchors via it)
            unique=True, max_size=4,
        ),
        st.lists(  # primer2 mutations, anywhere
            st.integers(min_value=0, max_value=PLEN - 1),
            unique=True, max_size=4,
        ),
        st.integers(min_value=0, max_value=2),  # -N
        st.integers(min_value=0, max_value=3),  # -X
        st.integers(min_value=0, max_value=(1 << 31) - 1),  # data seed
    )
    @settings(max_examples=60, deadline=None)
    def test_verify_matches_python_model(mut1, mut2, n_mm, x, seed):
        """The device verify (mismatch budget + 3'-protection, both
        strands' rules) must agree with an independent Python model of
        reference _compare_seqs (engine.py:599-642) on planted anchors
        with known mismatch positions."""
        import tempfile

        rng = _random.Random(seed)
        sub = {"A": "C", "C": "G", "G": "T", "T": "A"}  # guaranteed mismatch
        p1 = "".join(rng.choices("ACGT", k=PLEN))
        p2 = "".join(rng.choices("ACGT", k=PLEN))
        size = 60
        g = list(rng.choices("ACGT", k=200))
        k = 50
        g[k : k + PLEN] = p1
        g[k + size - PLEN : k + size] = p2
        for m in mut1:
            g[k + m] = sub[g[k + m]]
        for m in mut2:
            g[k + size - PLEN + m] = sub[g[k + size - PLEN + m]]

        # Python model: '+' protects the LAST x bases of p1, the FIRST x
        # of p2 (p2 is compared on the '-' side of the amplicon)
        ok1 = len(mut1) <= n_mm and all(m < PLEN - x for m in mut1)
        ok2 = len(mut2) <= n_mm and all(m >= x for m in mut2)
        want = 1 if (ok1 and ok2) else 0

        with tempfile.TemporaryDirectory() as td:
            eng = _mk_engine(
                td, f"P\t{p1}\t{p2}\t{size}\n",
                margin=0, mismatches=n_mm, three_prime_match=x,
            )
            fa = _os.path.join(td, "g.fa")
            with open(fa, "w") as fh:
                fh.write(">g\n" + "".join(g) + "\n")
            recs = eng.load_fasta_file(fa)
            lines = _search_lines(eng, recs)
        got = sum(1 for ln in lines if ln.split("\t")[2] == "P")
        assert got == want, (mut1, mut2, n_mm, x, lines)

    @given(st.binary(max_size=400))
    @settings(max_examples=100, deadline=None)
    def test_loaders_survive_byte_soup(data):
        """On arbitrary bytes the loaders either parse or raise exactly
        UnicodeDecodeError (reference parity: its text-mode open does the
        same and the CLI maps it to exit 1); parsed FASTA sequences keep
        only the 16-letter alphabet (reference fasta.py:60)."""
        import tempfile

        allowed = set("ACGTBDHKMNRSVWXYacgtbdhkmnrsvwxy")
        with tempfile.TemporaryDirectory() as td:
            p = _os.path.join(td, "soup")
            with open(p, "wb") as fh:
                fh.write(data)
            eng = _pkg.MerPCR()
            try:
                eng.load_sts_file(p)  # bool either way
            except UnicodeDecodeError:
                pass
            try:
                recs = eng.load_fasta_file(p)
            except UnicodeDecodeError:
                recs = []
            for r in recs:
                assert set(r.sequence) <= allowed

    @given(
        st.integers(min_value=0, max_value=(1 << 31) - 1),
        st.permutations(list(range(4))),
    )
    @settings(max_examples=15, deadline=None)
    def test_emission_invariant_under_record_permutation(seed, perm):
        """Per-record output lines don't depend on the other records'
        order (records are independent in the reference's per-record
        loop, engine.py:373)."""
        import tempfile

        rng = _random.Random(seed)
        p1 = "".join(rng.choices("ACGT", k=PLEN))
        p2 = "".join(rng.choices("ACGT", k=PLEN))
        size = 60
        recs_txt = []
        for r in range(4):
            g = list(rng.choices("ACGT", k=rng.randrange(80, 400)))
            if len(g) >= size and rng.random() < 0.8:
                k = rng.randrange(0, len(g) - size)
                g[k : k + PLEN] = p1
                g[k + size - PLEN : k + size] = p2
            recs_txt.append("".join(g))

        def run(order):
            with tempfile.TemporaryDirectory() as td:
                eng = _mk_engine(td, f"P\t{p1}\t{p2}\t{size}\n", margin=4)
                fa = _os.path.join(td, "g.fa")
                with open(fa, "w") as fh:
                    for i in order:
                        fh.write(f">r{i}\n{recs_txt[i]}\n")
                return _search_lines(eng, eng.load_fasta_file(fa))

        base = run(list(range(4)))
        shuffled = run(list(perm))
        for i in range(4):
            mine = [ln for ln in base if ln.startswith(f"r{i}\t")]
            theirs = [ln for ln in shuffled if ln.startswith(f"r{i}\t")]
            assert mine == theirs

    @given(st.integers(min_value=0, max_value=(1 << 31) - 1))
    @settings(max_examples=15, deadline=None)
    def test_stream_equals_per_record_searches(seed):
        """A multi-record search (stream plane) emits exactly the
        concatenation of single-record searches (CLAUDE.md invariant 3:
        batching must be invisible)."""
        import tempfile

        rng = _random.Random(seed)
        p1 = "".join(rng.choices("ACGT", k=PLEN))
        p2 = "".join(rng.choices("ACGT", k=PLEN))
        size = 60
        texts = []
        for r in range(rng.randrange(2, 7)):
            g = list(rng.choices("ACGT", k=rng.randrange(30, 300)))
            if len(g) >= size and rng.random() < 0.7:
                k = rng.randrange(0, len(g) - size)
                g[k : k + PLEN] = p1
                g[k + size - PLEN : k + size] = p2
            texts.append("".join(g))
        with tempfile.TemporaryDirectory() as td:
            eng = _mk_engine(td, f"P\t{p1}\t{p2}\t{size}\n", margin=4)
            fa = _os.path.join(td, "all.fa")
            with open(fa, "w") as fh:
                for i, t in enumerate(texts):
                    fh.write(f">r{i}\n{t}\n")
            recs = eng.load_fasta_file(fa)
            combined = _search_lines(eng, recs)
            singly = []
            for r in recs:
                singly += _search_lines(eng, [r])
        assert combined == singly
