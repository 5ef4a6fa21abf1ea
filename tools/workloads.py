"""Realistic / adversarial genome + STS content generators.

The reference engine's inner loop is content-insensitive (same cost per
position on any input — /root/reference/src/merpcr/core/engine.py:481-505).
This engine's throughput rests on density-model capacity heuristics, so its
"matches or beats" claim must be proven on the content real genomes have,
not only uniform-random ACGT:

* ``gen_masked_nruns``     — GRCh38-like composition: ~5% N in long runs
                             (centromere/telomere-style) + ~50% soft-masked
                             (lowercase) runs.
* ``gen_lowcomplex``       — (AC)n / (AT)n / (AG)n / homopolymer tracts over
                             a random background (~20% of positions).
* ``sts_repeat_primers``   — STS set in which a fraction of primers carry
                             the same low-complexity tracts (collides with
                             ``gen_lowcomplex`` content).
* ``gen_shared_wmer_sts``  — shared-W-mer-heavy STS set: many entries per
                             bucket (the pathological table shape).
* ``gen_tandem_tract``     — a genome tract that is one W-mer repeated in
                             tandem (every period-th scan position hits the
                             shared bucket).

Shared by bench.py (matrix rows), tools/difffuzz.py (content modes) and
tests/test_pathological.py (oracle cases). Pure stdlib; generators take a
``random.Random`` so every caller is reproducible.
"""

from __future__ import annotations

BASES = "ACGT"


def _rand_bases(rng, n: int) -> list:
    return rng.choices(BASES, k=n)


def gen_masked_nruns(
    rng,
    n: int,
    n_frac: float = 0.05,
    mask_frac: float = 0.5,
    run_len: tuple = (10_000, 1_000_000),
) -> str:
    """Random ACGT with ~``n_frac`` of positions inside N-runs and
    ~``mask_frac`` inside soft-masked (lowercase) runs.

    Run lengths are drawn log-uniform in ``run_len`` (clamped to the
    genome), so small test genomes get proportionally long runs — the
    adversarial property is run LENGTH vs tile length, not absolute size.
    """
    import math

    g = _rand_bases(rng, n)
    lo, hi = run_len
    hi = max(lo, min(hi, n))

    def _runs(target: int, apply):
        placed = 0
        while placed < target:
            ln = int(math.exp(rng.uniform(math.log(lo), math.log(hi))))
            ln = min(ln, target - placed) or 1
            start = rng.randrange(0, max(1, n - ln))
            apply(start, ln)
            placed += ln

    _runs(int(n * n_frac), lambda s, ln: g.__setitem__(
        slice(s, s + ln), ["N"] * ln))
    _runs(int(n * mask_frac), lambda s, ln: g.__setitem__(
        slice(s, s + ln), [c.lower() for c in g[s : s + ln]]))
    return "".join(g)


_TRACT_UNITS = ("AC", "AT", "AG", "CT", "A", "T", "AAT", "CAG")


def _tract(rng, ln: int) -> str:
    u = rng.choice(_TRACT_UNITS)
    return (u * (ln // len(u) + 1))[:ln]


def gen_lowcomplex(
    rng,
    n: int,
    tract_frac: float = 0.2,
    tract_len: tuple = (100, 5000),
) -> str:
    """Random ACGT with ~``tract_frac`` of positions inside low-complexity
    repeat tracts ((AC)n, (AT)n, homopolymers, trinucleotide)."""
    g = _rand_bases(rng, n)
    placed = 0
    target = int(n * tract_frac)
    lo, hi = tract_len
    hi = min(hi, max(lo + 1, n // 2))
    while placed < target:
        ln = min(rng.randrange(lo, hi), target - placed) or 1
        start = rng.randrange(0, max(1, n - ln))
        g[start : start + ln] = _tract(rng, ln)
        placed += ln
    return "".join(g)


def sts_lines(rng, n_sts: int, p1s=None, p2s=None, prefix="WK") -> str:
    """Tab-delimited STS text; primers default to random 18-25-mers."""
    out = []
    for i in range(n_sts):
        p1 = (p1s[i] if p1s else None) or "".join(
            _rand_bases(rng, rng.randrange(18, 26)))
        p2 = (p2s[i] if p2s else None) or "".join(
            _rand_bases(rng, rng.randrange(18, 26)))
        size = rng.randrange(max(100, len(p1) + len(p2)), 400)
        out.append(f"{prefix}{i}\t{p1}\t{p2}\t{size}")
    return "\n".join(out) + "\n"


def sts_repeat_primers(
    rng, n_sts: int, repeat_frac: float = 0.2, pure_frac: float = 1.0
) -> str:
    """STS set where ``repeat_frac`` of the primer1s are repeat-bearing:
    ``pure_frac`` of those are WHOLE low-complexity tracts (every tract
    position anchors — the brutal case), the rest tract-PREFIXED with a
    unique tail (the realistic case: the front end floods with
    candidates, the verify kills them)."""
    p1s = []
    for i in range(n_sts):
        if rng.random() < repeat_frac:
            ln = rng.randrange(18, 26)
            if rng.random() < pure_frac:
                p1s.append(_tract(rng, ln))
            else:
                head = _tract(rng, rng.randrange(12, 16))
                p1s.append(
                    head + "".join(_rand_bases(rng, ln - len(head)))
                )
        else:
            p1s.append(None)
    return sts_lines(rng, n_sts, p1s=p1s, prefix="RPT")


def gen_shared_wmer_sts(
    rng,
    n_sts: int,
    wordsize: int = 11,
    n_buckets: int = 1,
    shared: str | None = None,
    ext_match_frac: float = 0.0,
    tandem_period: int | None = None,
) -> tuple:
    """STS set whose primer1s all start with one of ``n_buckets`` shared
    W-mers (many entries per hash bucket). Returns (sts_text, shared_list).

    ``ext_match_frac`` of entries extend the shared W-mer with its tandem
    continuation (period ``tandem_period`` or the W-mer length), so those
    entries' primer1 fully matches a tandem tract of the W-mer — they
    survive strict front ends and flood the anchor stage too."""
    shared_list = (
        [shared] if shared else
        ["".join(_rand_bases(rng, wordsize)) for _ in range(n_buckets)]
    )
    period = tandem_period or wordsize
    p1s = []
    for i in range(n_sts):
        s = shared_list[i % len(shared_list)]
        ln = rng.randrange(18, 26)
        if rng.random() < ext_match_frac:
            tandem = (s * (ln // len(s) + 2))[:ln]
            p1s.append(tandem)
        else:
            p1s.append(s + "".join(_rand_bases(rng, ln - len(s))))
    return sts_lines(rng, n_sts, p1s=p1s, prefix="SHW"), shared_list


def gen_tandem_tract(rng, n: int, unit: str, tract_frac: float = 0.3) -> str:
    """Random genome with one tract of ``unit`` repeated in tandem covering
    ~``tract_frac`` of it (every len(unit)-th scan position in the tract
    hits unit's bucket)."""
    g = _rand_bases(rng, n)
    ln = int(n * tract_frac)
    start = rng.randrange(0, max(1, n - ln))
    g[start : start + ln] = (unit * (ln // len(unit) + 1))[:ln]
    return "".join(g)


def write_fasta(path: str, genome: str, label: str = "wk", width: int = 80):
    with open(path, "w") as fh:
        fh.write(f">{label}\n")
        for i in range(0, len(genome), width):
            fh.write(genome[i : i + width] + "\n")
