"""Engine behavior tests (mirrors reference tests/test_basic.py,
test_engine_internals.py, test_core_engine_comprehensive.py)."""

import numpy as np
import pytest

import merpcr_tpu
from merpcr_tpu.engine import MerPCR
from .conftest import run_search

pytestmark = pytest.mark.unit

P1 = "GGCTCAGAGTATTTGGGATG"  # len 20
P2 = "CTCTTGGAATCCTATCTCACTG"  # len 22
RC = {"A": "T", "C": "G", "G": "C", "T": "A"}


def revcomp(s):
    return "".join(RC[c] for c in reversed(s))


def make_genome(prefix_n, product, suffix_n, orientation="+"):
    """Genome containing one planted amplicon of (P1, P2, product)."""
    rng = np.random.default_rng(7)
    body = list("".join(rng.choice(list("ACGT"), size=product)))
    if orientation == "+":
        body[: len(P1)] = P1
        body[product - len(P2) :] = P2
    else:  # '-': p2 ... revcomp(p1) (SURVEY.md §2.1 orientation contract)
        body[: len(P2)] = P2
        body[product - len(P1) :] = revcomp(P1)
    pre = "".join(rng.choice(list("ACGT"), size=prefix_n))
    suf = "".join(rng.choice(list("ACGT"), size=suffix_n))
    return pre + "".join(body) + suf


def search_text(eng, fa_text, tmp_path):
    p = tmp_path / "g.fa"
    p.write_text(fa_text)
    recs = eng.load_fasta_file(str(p))
    return run_search(eng, recs)


@pytest.fixture
def eng(tmp_path):
    e = MerPCR()
    sts = tmp_path / "s.sts"
    sts.write_text(f"S1\t{P1}\t{P2}\t200\tAL\n")
    assert e.load_sts_file(str(sts))
    return e


class TestParamValidation:
    # reference engine.py:80-97 bounds
    def test_ok_defaults(self):
        MerPCR()

    @pytest.mark.parametrize("kw", [
        dict(wordsize=2), dict(wordsize=17),
        dict(mismatches=-1), dict(mismatches=11),
        dict(margin=-1), dict(margin=10001),
        dict(three_prime_match=-1),
        dict(default_pcr_size=0), dict(default_pcr_size=10001),
    ])
    def test_bad(self, kw):
        with pytest.raises(ValueError):
            MerPCR(**kw)


class TestSearchSemantics:
    def test_plus_orientation_hit(self, eng, tmp_path):
        g = make_genome(100, 200, 100, "+")
        out = search_text(eng, f">g\n{g}\n", tmp_path)
        assert out == "g\t101..300\tS1\tAL\t(+)\n"

    def test_minus_orientation_hit(self, eng, tmp_path):
        g = make_genome(100, 200, 100, "-")
        out = search_text(eng, f">g\n{g}\n", tmp_path)
        assert out == "g\t101..300\tS1\tAL\t(-)\n"

    def test_classical_layout_yields_nothing(self, eng, tmp_path):
        # p1 ... revcomp(p2) — textbook PCR layout — must yield ZERO hits
        # (reference as-written orientation semantics, SURVEY.md §2.1)
        rng = np.random.default_rng(3)
        body = list("".join(rng.choice(list("ACGT"), size=200)))
        body[: len(P1)] = P1
        body[200 - len(P2) :] = revcomp(P2)
        g = "".join(body)
        out = search_text(eng, f">g\n{g}\n", tmp_path)
        assert out == ""

    def test_hit_at_sequence_edges(self, eng, tmp_path):
        g = make_genome(0, 200, 0, "+")
        out = search_text(eng, f">g\n{g}\n", tmp_path)
        assert out == "g\t1..200\tS1\tAL\t(+)\n"

    def test_sequence_equal_wordsize_no_scan(self, tmp_path):
        # reference engine.py:458-459: seq_len <= wordsize -> no scan
        e = MerPCR()
        sts = tmp_path / "s.sts"
        sts.write_text(f"S1\t{P1}\t{P2}\t200\n")
        e.load_sts_file(str(sts))
        out = search_text(e, ">g\nACGTACGTACG\n", tmp_path)  # exactly 11
        assert out == ""

    def test_mismatch_budget(self, tmp_path):
        g = make_genome(50, 200, 50, "+")
        # mutate one primer1 base OUTSIDE the hash W-mer (anchoring needs an
        # exact first-valid W-mer — me-PCR semantics, reference
        # engine.py:483-487) and outside the 3' protected tail
        i = 50 + 15
        g = g[:i] + ("A" if g[i] != "A" else "C") + g[i + 1 :]
        for n, expect in [(0, 0), (1, 1)]:
            e = MerPCR(mismatches=n)
            sts = tmp_path / "s.sts"
            sts.write_text(f"S1\t{P1}\t{P2}\t200\n")
            e.load_sts_file(str(sts))
            out = search_text(e, f">g\n{g}\n", tmp_path)
            assert len(out.splitlines()) == expect, f"N={n}"

    def test_three_prime_protection(self, tmp_path):
        # mutation in the last X bases of primer1 kills the hit even with
        # mismatch budget (reference engine.py:607-636)
        g = make_genome(50, 200, 50, "+")
        i = 50 + len(P1) - 1  # last base of primer1
        g = g[:i] + ("A" if g[i] != "A" else "C") + g[i + 1 :]
        sts_text = f"S1\t{P1}\t{P2}\t200\n"
        for x, expect in [(1, 0), (0, 1)]:
            e = MerPCR(mismatches=1, three_prime_match=x)
            sts = tmp_path / "s.sts"
            sts.write_text(sts_text)
            e.load_sts_file(str(sts))
            out = search_text(e, f">g\n{g}\n", tmp_path)
            assert len(out.splitlines()) == expect, f"X={x}"

    def test_margin_window(self, tmp_path):
        # product size 220 vs expected 200: found iff margin >= 20
        g = make_genome(50, 220, 50, "+")
        for m, expect in [(0, 0), (19, 0), (20, 1), (50, 1)]:
            e = MerPCR(margin=m)
            sts = tmp_path / "s.sts"
            sts.write_text(f"S1\t{P1}\t{P2}\t200\n")
            e.load_sts_file(str(sts))
            out = search_text(e, f">g\n{g}\n", tmp_path)
            assert len(out.splitlines()) == expect, f"M={m}"

    def test_iupac_mode(self, tmp_path):
        # primer with N (outside the hash W-mer, so the forward record still
        # gets a hash — reference engine.py:264-270) matches any genome base
        # only when -I 1
        p1n = P1[:15] + "N" + P1[16:]
        g = make_genome(50, 200, 50, "+")
        for iu, expect in [(0, 0), (1, 1)]:
            e = MerPCR(iupac_mode=iu)
            sts = tmp_path / "s.sts"
            sts.write_text(f"S1\t{p1n}\t{P2}\t200\n")
            e.load_sts_file(str(sts))
            out = search_text(e, f">g\n{g}\n", tmp_path)
            assert len(out.splitlines()) == expect, f"I={iu}"

    def test_ambiguous_genome_base_blocks_window(self, eng, tmp_path):
        # N inside the hash word region of primer1's site kills the anchor
        # when not IUPAC (scan window invalid, reference engine.py:496-503)
        g = make_genome(50, 200, 50, "+")
        g = g[:55] + "N" + g[56:]
        out = search_text(eng, f">g\n{g}\n", tmp_path)
        assert out == ""

    def test_multiple_records_and_hits(self, eng, tmp_path):
        g1 = make_genome(10, 200, 10, "+")
        g2 = make_genome(30, 200, 30, "-")
        out = search_text(eng, f">a\n{g1}\n>b\n{g2}\n", tmp_path)
        assert out == ("a\t11..210\tS1\tAL\t(+)\n" "b\t31..230\tS1\tAL\t(-)\n")

    def test_empty_table_searches_clean(self, tmp_path):
        e = MerPCR()
        sts = tmp_path / "s.sts"
        sts.write_text("S1\tACGT\tACGT\t100\n")  # both primers < wordsize
        assert e.load_sts_file(str(sts))
        assert len(e.sts_records) == 0
        out = search_text(e, ">g\nACGTACGTACGTACGTACGT\n", tmp_path)
        assert out == ""

    def test_lowercase_genome(self, eng, tmp_path):
        g = make_genome(50, 200, 50, "+").lower()
        out = search_text(eng, f">g\n{g}\n", tmp_path)
        assert len(out.splitlines()) == 1


class TestTiling:
    def test_multi_tile_equivalence(self, tmp_path):
        """Hits planted straddling tile boundaries are found exactly once
        (scan positions are partitioned; SURVEY.md §5 boundary property)."""
        rng = np.random.default_rng(11)
        n = 40000
        g = list("".join(rng.choice(list("ACGT"), size=n)))
        amp = make_genome(0, 200, 0, "+")
        tile = 4096
        spots = [0, tile - 100, tile - 1, tile, 2 * tile - 200, 3 * tile + 5,
                 n - 200]
        for s in spots:
            g[s : s + 200] = amp
        gtext = "".join(g)

        def run(tile_len):
            e = MerPCR()
            sts = tmp_path / "s.sts"
            sts.write_text(f"S1\t{P1}\t{P2}\t200\n")
            e.load_sts_file(str(sts))
            if tile_len:
                e._tile_len_override = tile_len
            return search_text(e, f">g\n{gtext}\n", tmp_path)

        whole = run(None)  # single tile (bucket covers 40k)
        tiled = run(tile)  # 10 tiles of 4096
        assert whole == tiled
        # overlapping plants clobber each other; at least the separated ones
        # survive, including boundary-straddling hits
        assert len(whole.splitlines()) >= 4


class TestRealisticDensityCapacity:
    def test_no_rescan_at_realistic_hit_density(self, tmp_path, monkeypatch):
        """~90 real hits in one 64 kb tile (one per ~700 bp — far denser
        than real STS maps) must fit the DEFAULT per-tile anchor/hit
        capacities: a hit-bearing search must never pay the per-tile
        rescan (escalation) path, which costs an extra dispatch + full
        round trip per tile per search (regression guard for the
        anch_cap=64 collapse fixed in fe8b5dd)."""
        rng = np.random.default_rng(3)
        n = 64 * 1024
        g = list("".join(rng.choice(list("ACGT"), size=n)))
        amp = make_genome(0, 200, 0, "+")
        n_plant = 90
        for i in range(n_plant):
            s = 17 + i * 700
            g[s : s + 200] = amp

        calls = []
        orig = MerPCR._rescan_tile

        def counting(self, *a, **k):
            calls.append(a)
            return orig(self, *a, **k)

        monkeypatch.setattr(MerPCR, "_rescan_tile", counting)
        e = MerPCR()
        sts = tmp_path / "s.sts"
        sts.write_text(f"S1\t{P1}\t{P2}\t200\n")
        assert e.load_sts_file(str(sts))
        out = search_text(e, f">g\n{''.join(g)}\n", tmp_path)
        assert len(out.splitlines()) == n_plant
        assert calls == [], "default caps must absorb realistic hit density"


class TestReproducibility:
    def test_repeated_runs_identical(self, eng, tmp_path):
        """5 searches of the same inputs produce byte-identical output
        (the reference CI's reproducibility job, ci.yml:562-589)."""
        fa = f">g\n{make_genome(3000, 200, 3000, '+')}\n"
        outs = {search_text(eng, fa, tmp_path) for _ in range(5)}
        assert len(outs) == 1 and outs.pop() != ""

    def test_concurrent_instances(self, tmp_path):
        """Interleaved searches from two independent engines don't share
        state (device plane caches key on the owning arrays)."""
        fa_a = f">a\n{make_genome(1000, 200, 1000, '+')}\n"
        fa_b = f">b\n{make_genome(2000, 200, 500, '-')}\n"
        sts = tmp_path / "s.sts"
        sts.write_text(f"S1\t{P1}\t{P2}\t200\tAL\n")
        e1, e2 = MerPCR(), MerPCR(margin=120)
        assert e1.load_sts_file(str(sts)) and e2.load_sts_file(str(sts))
        a1 = search_text(e1, fa_a, tmp_path)
        b1 = search_text(e2, fa_b, tmp_path)
        a2 = search_text(e1, fa_a, tmp_path)
        b2 = search_text(e2, fa_b, tmp_path)
        assert a1 == a2 and b1 == b2
        assert a1.startswith("a\t") and b1.startswith("b\t")


class TestStreamPlan:
    def test_consecutive_records_stream_into_one_dispatch(
        self, tmp_path, monkeypatch
    ):
        """Consecutive packed records — small AND multi-tile large —
        concatenate into ONE stream dispatch, and the output equals the
        per-record path record-for-record (same bytes, FASTA order)."""
        rng = np.random.default_rng(21)
        recs_fa = []
        for c in range(7):
            n = 150_000 if c == 3 else 9_000  # record 3 is multi-tile-ish
            s = list("".join(rng.choice(list("ACGT"), size=n)))
            amp = make_genome(0, 200, 0, "+")
            s[50 : 250] = amp
            recs_fa.append(f">r{c}\n{''.join(s)}")
        fa = "\n".join(recs_fa) + "\n"

        sts = tmp_path / "s.sts"
        sts.write_text(f"S1\t{P1}\t{P2}\t200\n")

        stream_calls, single_calls = [], []

        def run(counting, force_single=False):
            e = MerPCR()
            e._tile_len_override = 16384  # record 3 -> multi-tile
            assert e.load_sts_file(str(sts))
            if counting:
                ob, osd = MerPCR._dispatch_stream, MerPCR._dispatch_record

                def cb(self, items):
                    stream_calls.append(len(items))
                    return ob(self, items)

                def cs(self, *a, **k):
                    single_calls.append(1)
                    return osd(self, *a, **k)

                monkeypatch.setattr(MerPCR, "_dispatch_stream", cb)
                monkeypatch.setattr(MerPCR, "_dispatch_record", cs)
            if force_single:
                # disable streaming: every record takes the single path
                monkeypatch.setattr(MerPCR, "STREAM_MAX_RECORDS", 1)
            out = search_text(e, fa, tmp_path)
            if counting:
                monkeypatch.setattr(MerPCR, "_dispatch_stream", ob)
                monkeypatch.setattr(MerPCR, "_dispatch_record", osd)
            return out

        got = run(True)
        assert stream_calls == [7]  # one stream covers the whole FASTA
        assert single_calls == []
        assert len(got.splitlines()) == 7
        # order is FASTA order: r0..r6
        labels = [ln.split("\t")[0] for ln in got.splitlines()]
        assert labels == [f"r{c}" for c in range(7)]
        assert got == run(False, force_single=True)  # byte-equal paths
