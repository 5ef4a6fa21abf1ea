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
    PLEN = 20  # fixed length for the permutation/stream invariance tests
    #           (one compiled verify program keeps them fast; the verify
    #           property below varies lengths itself)

    @given(
        st.integers(min_value=12, max_value=26),  # primer1 length
        st.integers(min_value=12, max_value=26),  # primer2 length
        st.lists(  # primer1 mutation FRACTIONS, only PAST the W-mer
            st.floats(min_value=0.0, max_value=1.0),  # (the scan anchors
            max_size=4,  # via the exact hash lookup, reference :483)
        ),
        st.lists(  # primer2 mutation fractions, anywhere
            st.floats(min_value=0.0, max_value=1.0),
            max_size=4,
        ),
        st.integers(min_value=0, max_value=2),  # -N
        st.integers(min_value=0, max_value=3),  # -X
        st.integers(min_value=0, max_value=8),  # -M (margin)
        st.sampled_from(["mid", "start", "end"]),  # planted position
        st.integers(min_value=0, max_value=(1 << 31) - 1),  # data seed
    )
    @settings(max_examples=60, deadline=None)
    def test_verify_matches_python_model(
        plen1, plen2, mf1, mf2, n_mm, x, margin, where, seed
    ):
        """The device verify (mismatch budget + 3'-protection, both
        strands' rules, margin/end clamps) must agree with an independent
        Python model of reference _compare_seqs (engine.py:599-642) on
        planted anchors with known mismatch positions — across primer
        LENGTHS, margins, and plants at the record edges (VERDICT r4 #8
        lifted the old fixed PLEN=20 / margin=0 restriction)."""
        import tempfile

        rng = _random.Random(seed)
        sub = {"A": "C", "C": "G", "G": "T", "T": "A"}  # guaranteed mismatch
        # fraction -> concrete unique position (dedup keeps the model exact)
        mut1 = sorted({W + int(f * (plen1 - W - 1e-9)) for f in mf1})
        mut2 = sorted({min(int(f * plen2), plen2 - 1) for f in mf2})
        p1 = "".join(rng.choices("ACGT", k=plen1))
        p2 = "".join(rng.choices("ACGT", k=plen2))
        size = max(plen1 + plen2, 60)
        glen = rng.randrange(size + 20, 300)
        g = list(rng.choices("ACGT", k=glen))
        # plant flush against the record edges sometimes: exercises the
        # reference's end clamps (engine.py:524-541) at k=0 / k+size==len
        k = {
            "mid": rng.randrange(5, glen - size - 5),
            "start": 0,
            "end": glen - size,
        }[where]
        g[k : k + plen1] = p1
        g[k + size - plen2 : k + size] = p2
        for m in mut1:
            g[k + m] = sub[g[k + m]]
        for m in mut2:
            g[k + size - plen2 + m] = sub[g[k + size - plen2 + m]]

        # Python model: '+' protects the LAST x bases of p1, the FIRST x
        # of p2 (p2 is compared on the '-' side of the amplicon). The
        # planted amplicon sits at exactly the expected size, so margin
        # only ADDS candidate windows; random >=12-mer matches elsewhere
        # in a <300 bp genome are vanishingly unlikely but the count
        # check below is >=, not ==, for the margin>0 case.
        ok1 = len(mut1) <= n_mm and all(m < plen1 - x for m in mut1)
        ok2 = len(mut2) <= n_mm and all(m >= x for m in mut2)
        want = 1 if (ok1 and ok2) else 0

        with tempfile.TemporaryDirectory() as td:
            eng = _mk_engine(
                td, f"P\t{p1}\t{p2}\t{size}\n",
                margin=margin, mismatches=n_mm, three_prime_match=x,
            )
            fa = _os.path.join(td, "g.fa")
            with open(fa, "w") as fh:
                fh.write(">g\n" + "".join(g) + "\n")
            recs = eng.load_fasta_file(fa)
            lines = _search_lines(eng, recs)
        got = sum(
            1
            for ln in lines
            if ln.split("\t")[2] == "P"
            and ln.split("\t")[1] == f"{k + 1}..{k + size}"
        )
        assert got == want, (mut1, mut2, n_mm, x, margin, where, lines)

    # In-process differential property vs the ACTUAL reference package:
    # arbitrary IUPAC/case content (not just planted clean mutations) must
    # produce byte-identical stdout. Subsumes the reference's standalone
    # compare_seqs diff-count property (its tests/test_property_based.py:
    # 299-334) at full-pipeline strength: the compare semantics, margin
    # walk, and emission order are all under test per example.
    from .conftest import REFERENCE_ROOT as _REF

    _have_ref = _os.path.isdir(_os.path.join(_REF, "src"))

    @given(
        st.integers(min_value=0, max_value=(1 << 31) - 1),  # data seed
        st.integers(min_value=0, max_value=2),  # -N
        st.booleans(),  # -I
        st.integers(min_value=0, max_value=6),  # -M
        st.floats(min_value=0.0, max_value=0.08),  # IUPAC letter rate
    )
    @settings(max_examples=25, deadline=None)
    @pytest.mark.skipif(
        not _have_ref, reason="reference not mounted"
    )
    def test_matches_reference_on_arbitrary_content(
        seed, n_mm, iupac, margin, amb_rate
    ):
        import tempfile

        from .conftest import oracle_engine, run_search

        rng = _random.Random(seed)
        letters = "ACGTBDHKMNRSVWXY"
        glen = rng.randrange(80, 300)
        g = [
            (
                rng.choice(letters[4:])
                if rng.random() < amb_rate
                else rng.choice("ACGT")
            )
            for _ in range(glen)
        ]
        g = [c.lower() if rng.random() < 0.3 else c for c in g]
        genome = "".join(g)
        # primers derived FROM genome slices (mutated/case-flipped copies
        # produce real anchors; as-written orientation semantics mean the
        # '+' layout is p1 ... p2 verbatim — SURVEY.md §2.1)
        sts_lines = []
        for i in range(rng.randrange(1, 4)):
            plen = rng.randrange(12, 25)
            if glen > 2 * plen + 10 and rng.random() < 0.8:
                a = rng.randrange(0, glen - 2 * plen - 5)
                b = rng.randrange(a + plen, glen - plen)
                p1 = genome[a : a + plen].upper()
                p2 = genome[b : b + plen].upper()
                size = b + plen - a
                if rng.random() < 0.4:  # mutate a position or two
                    p1 = list(p1)
                    p1[rng.randrange(plen)] = rng.choice(letters)
                    p1 = "".join(p1)
            else:
                p1 = "".join(rng.choices(letters, k=plen))
                p2 = "".join(rng.choices(letters, k=plen))
                size = rng.randrange(40, 200)
            sts_lines.append(f"S{i}\t{p1}\t{p2}\t{size}\talias{i}")
        sts_text = "\n".join(sts_lines) + "\n"

        params = dict(
            margin=margin, mismatches=n_mm, iupac_mode=int(iupac)
        )
        with tempfile.TemporaryDirectory() as td:
            sp = _os.path.join(td, "p.sts")
            fa = _os.path.join(td, "g.fa")
            with open(sp, "w") as fh:
                fh.write(sts_text)
            with open(fa, "w") as fh:
                fh.write(">rec arbitrary\n" + genome + "\n")

            eng = _pkg.MerPCR(**params)
            ref = oracle_engine(**params)
            ok_mine = eng.load_sts_file(sp)
            ok_ref = ref.load_sts_file(sp)
            assert ok_mine == ok_ref
            if not ok_mine:
                return
            mine = "\n".join(
                _search_lines(eng, eng.load_fasta_file(fa))
            )
            theirs = run_search(
                ref, ref.load_fasta_file(fa)
            ).rstrip("\n")
            assert mine == theirs.rstrip("\n")

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
