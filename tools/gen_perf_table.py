"""Regenerate the README performance table from BENCH_MATRIX.json.

Every README number must be a driver-reproducible artifact line
(VERDICT r2 #2): run `python bench.py --matrix` on the TPU (and
`python bench.py --cold-only` for the cold column), then
`python tools/gen_perf_table.py` prints the markdown rows for README.md
straight from the JSON artifacts.
"""

import json
import os
import sys

ROWS = {
    "sparse_100": ("100 STS", "~3.2 Mbp/s"),
    "sparse_1k": ("1,000 STS", "3.2 Mbp/s"),
    "sparse_10k": ("10,000 STS", "~3 Mbp/s"),
    "chr1_250mbp": ("250 Mbp genome (chr1 scale), 1,000 STS", "3.2 Mbp/s"),
    "dense_50k": ("50,000 STS", "2.3 Mbp/s"),
    "planted_200": ("1,000 STS, 200 real hits", "~3 Mbp/s"),
    "iupac": ("1,000 STS, IUPAC mode (-I 1)", "~3 Mbp/s"),
    "iupac_dirty": ("IUPAC mode, 1% ambiguity letters in genome", "~3 Mbp/s"),
    "mismatch_1": ("1,000 STS, 1 mismatch (-N 1)", "~3 Mbp/s"),
    "mismatch_2": ("1,000 STS, 2 mismatches (-N 2)", "~3 Mbp/s"),
    "x0_no3prime": ("1,000 STS, -X 0", "~3 Mbp/s"),
    "scaffolds_3000": ("3,000 x 10 kb scaffolds (30 Mbp)", "~3 Mbp/s"),
    "single_30mbp": ("single 30 Mbp record (scaffold control)", "3.2 Mbp/s"),
    "w12": ("1,000 STS, W=12", "~3 Mbp/s"),
    "w13": ("1,000 STS, W=13", "~3 Mbp/s"),
    "w14_multhash": ("1,000 STS, W=14", "~3 Mbp/s"),
    "w16_multhash": ("1,000 STS, W=16", "~3 Mbp/s"),
    "margin_1000": ("1,000 STS, -M 1000, 100 hits", "~3 Mbp/s"),
    "margin_10000": ("1,000 STS, -M 10000, 100 hits", "~3 Mbp/s"),
    "masked_nruns": ("soft-masked + N-run genome (GRCh38-like)", "~3 Mbp/s"),
    "lowcomplex_repeat": (
        "low-complexity tracts vs repeat primers", "0.16 Mbp/s*"),
    "shared_wmer_10k": ("10,000 STS sharing ~100 W-mers", "~3 Mbp/s"),
}

REF_RATE = 3.2  # Mbp/s, BASELINE.md


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_MATRIX.json"
    cold_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_COLD.json"
    if not os.path.exists(path):
        sys.exit(f"{path} not found — run `python bench.py --matrix` first")
    with open(path) as fh:
        results = json.load(fh)
    cold = {}
    if os.path.exists(cold_path):
        with open(cold_path) as fh:
            cold = {r["row"]: r for r in json.load(fh)}
    have_cold = bool(cold)
    hdr = "| workload | this engine | cold one-shot | reference (CPU, T=1) | speedup |"
    sep = "|---|---|---|---|---|"
    if not have_cold:
        hdr = "| workload | this engine | reference (CPU, T=1) | speedup |"
        sep = "|---|---|---|---|"
    print(hdr)
    print(sep)
    for res in results:
        row = res["detail"].get("row")
        label, ref = ROWS.get(row, (row, "~3.2 Mbp/s"))
        v = res["value"]
        # content-matched baseline for the flood row (README footnote):
        # the reference measured 0.159 Mbp/s on identical input
        speed = v / (0.159 if row == "lowcomplex_repeat" else REF_RATE)
        if have_cold:
            c = cold.get(row)
            cs = f"{c['cold_s']:.0f} s" if c and "cold_s" in c else "—"
            print(f"| {label} | {v:.0f} Mbp/s | {cs} | {ref} | ~{speed:.0f}x |")
        else:
            print(f"| {label} | {v:.0f} Mbp/s | {ref} | ~{speed:.0f}x |")
    be = {r["detail"]["backend"] for r in results}
    print(f"\nbackend(s): {sorted(be)}; artifact: {path}"
          + (f" + {cold_path}" if have_cold else ""))


if __name__ == "__main__":
    main()
