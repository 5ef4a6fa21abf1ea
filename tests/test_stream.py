"""Stream-mode tests: many records concatenated into one scan plane
(engine._dispatch_stream / ops/scan.py ScanConfig.stream).

The stream path is the production route for EVERY multi-record FASTA, so
its record-boundary semantics get direct adversarial coverage here —
always as byte-equality against either the reference oracle or the
engine's own single-record path (which the oracle suite already pins)."""

import random

import numpy as np
import pytest

import merpcr_tpu
from merpcr_tpu.engine import MerPCR

from .conftest import needs_oracle, oracle_engine, run_search

pytestmark = [pytest.mark.integration]

BASES = "ACGT"
P1 = "GGCTCAGAGTATTTGGGATGCA"
P2 = "CTCTTGGAATCCTATCTCACTG"


def _write(tmp_path, sts_text, recs):
    sts = tmp_path / "s.sts"
    fa = tmp_path / "g.fa"
    sts.write_text(sts_text)
    lines = []
    for i, body in enumerate(recs):
        lines.append(f">sr{i} stream rec")
        lines += [body[j : j + 70] for j in range(0, len(body), 70)]
    fa.write_text("\n".join(lines) + "\n")
    return str(sts), str(fa)


def _single_path_output(sts, fa, monkeypatch, **params):
    """Ground truth: the same engine with streaming disabled."""
    monkeypatch.setattr(MerPCR, "STREAM_MAX_RECORDS", 1)
    eng = merpcr_tpu.MerPCR(**params)
    assert eng.load_sts_file(sts)
    out = run_search(eng, eng.load_fasta_file(fa))
    monkeypatch.undo()
    return out


def _stream_output(sts, fa, expect_stream=True, tile=None, **params):
    eng = merpcr_tpu.MerPCR(**params)
    if tile:
        eng._tile_len_override = tile
    assert eng.load_sts_file(sts)
    recs = eng.load_fasta_file(fa)
    calls = []
    orig = MerPCR._dispatch_stream

    def counting(self, items):
        calls.append(len(items))
        return orig(self, items)

    MerPCR._dispatch_stream = counting
    try:
        out = run_search(eng, recs)
    finally:
        MerPCR._dispatch_stream = orig
    if expect_stream:
        assert calls, "stream path was not taken"
    return out


def test_records_straddle_tile_boundaries(tmp_path, monkeypatch):
    """With a small tile override, records land across tile boundaries
    inside the stream; hits planted right at the seams must come out
    byte-identical to the single-record path."""
    rng = random.Random(3)
    prod = 200
    recs = []
    for i in range(9):
        n = 5000 + 517 * i  # deliberately not tile-aligned
        g = list("".join(rng.choices(BASES, k=n)))
        pos = (1 << 12) - 60 + i  # amplicon straddles the 4096 seam
        if pos + prod < n:
            g[pos : pos + len(P1)] = P1
            g[pos + prod - len(P2) : pos + prod] = P2
        recs.append("".join(g))
    sts, fa = _write(tmp_path, f"S1\t{P1}\t{P2}\t{prod}\n", recs)
    got = _stream_output(sts, fa, tile=1 << 12)
    monkeypatch.setattr(MerPCR, "STREAM_MAX_RECORDS", 1)
    eng = merpcr_tpu.MerPCR()
    eng._tile_len_override = 1 << 12
    assert eng.load_sts_file(sts)
    want = run_search(eng, eng.load_fasta_file(fa))
    assert got == want and got.count("\n") >= 7


def test_mixed_tiny_empty_and_large_records(tmp_path, monkeypatch):
    """Sub-wordsize, empty-sequence and multi-tile records interleaved:
    the stream must reproduce the single-record path exactly (tiny and
    empty records emit nothing, like the reference)."""
    rng = random.Random(4)
    recs = []
    for i in range(12):
        kind = i % 4
        if kind == 0:
            n = rng.randrange(0, 11)  # at/below wordsize
        elif kind == 1:
            n = rng.randrange(12, 300)
        elif kind == 2:
            n = 40_000  # multi-tile at the test override
        else:
            n = rng.randrange(1000, 9000)
        g = list("".join(rng.choices(BASES, k=n)))
        if n > 300:
            pos = rng.randrange(0, n - 220)
            g[pos : pos + len(P1)] = P1
            g[pos + 200 - len(P2) : pos + 200] = P2
        recs.append("".join(g))
    sts, fa = _write(tmp_path, f"S1\t{P1}\t{P2}\t200\n", recs)
    got = _stream_output(sts, fa, tile=1 << 14)
    want = _single_path_output(sts, fa, monkeypatch)
    assert got == want and got.count("\n") >= 5


@needs_oracle
def test_hash_offset_and_boundary_anchors_vs_oracle(tmp_path):
    """Markers with hash_offset > 0 planted at record STARTS and ENDS:
    anchors computed as pos - hash_offset can fall before a record's
    first base — the stream's record-local bounds must reject them
    exactly like the reference."""
    rng = random.Random(5)
    p1 = "NNGCTCAGAGTATTTGGGATGCA"  # hash_offset 2
    p2 = P2
    prod = 190
    site = p1.replace("N", "A")
    recs = []
    for i in range(8):
        n = 2000
        g = list("".join(rng.choices(BASES, k=n)))
        if i % 2 == 0:  # amplicon flush at record start
            g[0 : len(site)] = site
            g[prod - len(p2) : prod] = p2
        else:  # amplicon flush at record end
            g[n - prod : n - prod + len(site)] = site
            g[n - len(p2) : n] = p2
        recs.append("".join(g))
    sts, fa = _write(tmp_path, f"S1\t{p1}\t{p2}\t{prod}\n", recs)
    # iupac mode: primer 'N' wildcards must match the planted 'A's
    ref = oracle_engine(iupac_mode=1)
    assert ref.load_sts_file(sts)
    want = run_search(ref, ref.load_fasta_file(fa))
    assert want.count("\n") >= 8
    assert _stream_output(sts, fa, iupac_mode=1) == want


def test_stream_chunk_flush_boundaries(tmp_path, monkeypatch):
    """A tiny STREAM_MAX_POSITIONS forces multiple stream chunks; chunk
    boundaries must not change output."""
    rng = random.Random(6)
    recs = []
    for i in range(10):
        n = rng.randrange(2000, 7000)
        g = list("".join(rng.choices(BASES, k=n)))
        if n > 300:
            pos = rng.randrange(0, n - 220)
            g[pos : pos + len(P1)] = P1
            g[pos + 200 - len(P2) : pos + 200] = P2
        recs.append("".join(g))
    sts, fa = _write(tmp_path, f"S1\t{P1}\t{P2}\t200\n", recs)
    want = _stream_output(sts, fa)
    monkeypatch.setattr(MerPCR, "STREAM_MAX_POSITIONS", 10_000)
    got = _stream_output(sts, fa)
    assert got == want and got.count("\n") >= 8


def test_stream_escalation_keeps_output_exact(tmp_path, monkeypatch):
    """Overflowing stream tiles retry via _rescan_stream_tile: shrink the
    hit/anchor capacities so escalation must fire, output unchanged."""
    rng = random.Random(7)
    prod = 120
    recs = []
    for i in range(6):
        g = list("".join(rng.choices(BASES, k=4000)))
        for pos in (200, 900, 1700, 2500):
            for off in (0, 25, 50):
                g[pos : pos + len(P1)] = P1
                s = pos + prod - len(P2) + off
                g[s : s + len(P2)] = P2
        recs.append("".join(g))
    sts, fa = _write(tmp_path, f"S1\t{P1}\t{P2}\t{prod}\n", recs)
    want = _stream_output(sts, fa, **dict(margin=60))

    from merpcr_tpu.ops.scan import ScanConfig

    real_base = MerPCR._base_config
    rescans = []
    real_rescan = MerPCR._rescan_stream_tile

    def tiny_base(self, tile_len, packed=True, stream=False, **kw):
        cfg = real_base(self, tile_len, packed=packed, stream=stream)
        if not stream:
            return cfg
        return ScanConfig(
            **{**cfg.__dict__, "anch_cap": 1, "hit_cap": 1}
        )

    def counting_rescan(self, cfg0, rescan_ctx, tile_idx, measured):
        rescans.append(tile_idx)
        return real_rescan(self, cfg0, rescan_ctx, tile_idx, measured)

    real_wave = MerPCR._rescan_wave

    def counting_wave(self, cfg0, overflow, totals, runner, **kw):
        done = real_wave(self, cfg0, overflow, totals, runner, **kw)
        rescans.extend(done.keys())  # wave-resolved tiles count too
        return done

    monkeypatch.setattr(MerPCR, "_base_config", tiny_base)
    monkeypatch.setattr(MerPCR, "_rescan_stream_tile", counting_rescan)
    monkeypatch.setattr(MerPCR, "_rescan_wave", counting_wave)
    got = _stream_output(sts, fa, **dict(margin=60))
    assert got == want and rescans  # escalation really ran
    assert want.count("\n") >= 50


@needs_oracle
def test_many_scaffolds_vs_oracle(tmp_path):
    """60 uneven scaffolds with mixed-case bases, ambiguity runs and
    planted hits in both orientations — full oracle byte-equality."""
    rng = random.Random(8)
    comp = str.maketrans("ACGT", "TGCA")
    rc1 = P1.translate(comp)[::-1]
    prod = 200
    recs = []
    for i in range(60):
        n = rng.randrange(30, 4000)
        g = list("".join(rng.choices(BASES + "acgt" + "N", weights=[20] * 8 + [1], k=n)))
        if n > prod + 10 and i % 3 == 0:
            pos = rng.randrange(0, n - prod - 1)
            if i % 2 == 0:  # (+): p1 ... p2
                g[pos : pos + len(P1)] = P1
                g[pos + prod - len(P2) : pos + prod] = P2
            else:  # (-): p2 ... revcomp(p1)
                g[pos : pos + len(P2)] = P2
                g[pos + prod - len(rc1) : pos + prod] = rc1
        recs.append("".join(g))
    sts, fa = _write(
        tmp_path, f"S1\t{P1}\t{P2}\t{prod}\nS2\t{P2}\t{P1}\t333\n", recs
    )
    ref = oracle_engine()
    assert ref.load_sts_file(sts)
    want = run_search(ref, ref.load_fasta_file(fa))
    assert want.count("\n") >= 10
    assert _stream_output(sts, fa) == want


@pytest.mark.parallel
def test_stream_mesh_matches_single_device(tmp_path, monkeypatch):
    """Mesh + stream: the sharded stream scan (tiles partitioned across
    an 8-device mesh, rmeta replicated) must reproduce the single-device
    stream output byte-for-byte."""
    import jax

    from merpcr_tpu.parallel.sharded import make_mesh

    rng = random.Random(9)
    recs = []
    for i in range(14):
        n = rng.randrange(40, 9000)
        g = list("".join(rng.choices(BASES, k=n)))
        if n > 300 and i % 2 == 0:
            pos = rng.randrange(0, n - 220)
            g[pos : pos + len(P1)] = P1
            g[pos + 200 - len(P2) : pos + 200] = P2
        recs.append("".join(g))
    sts, fa = _write(tmp_path, f"S1\t{P1}\t{P2}\t200\n", recs)
    want = _stream_output(sts, fa, tile=1 << 12)

    eng = merpcr_tpu.MerPCR().use_mesh(make_mesh(jax.devices()))
    eng._tile_len_override = 1 << 12
    assert eng.load_sts_file(sts)
    got = run_search(eng, eng.load_fasta_file(fa))
    assert got == want and got.count("\n") >= 6
