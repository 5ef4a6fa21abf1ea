"""The tile scan pipeline — the TPU-native replacement for the reference's
interpreted hot loops (engine.py:453-505 `_process_thread`,
engine.py:507-597 `_match_sts`, engine.py:599-642 `_compare_seqs`).

Design (array program, everything static-shaped and jit-compiled once):

  tile bytes (uint8[TB], halo-padded; packed = 2 bases/byte)
    │ 1. stride-S group decode: consecutive tap-unit slices build a 32-bit
    │    MSB-first group value (+ spill) — no rolling hash, no strided
    │    relayouts; per-phase W-mer hashes derive arithmetically
    │ 2. ambiguity masks aligned with the code bits (dirty base -> 11)
    │ 3. ONE mult-hashed bloom lookup per S positions (S=4 sparse, 2 dense)
    ▼
  compacted candidate groups (word-bitpack + scatter-max rank inversion)
    │ 4. exact per-phase CSR: (start,count) as one 2-wide row gather
    │ 5. (group, phase, slot) expansion via scatter-max rank inversion
    ▼
  candidate pairs (cap CAND) ── 6. primer1 verify: 16-byte row gathers +
    │                              byte barrel shift + nibble interleave;
    │                              mismatch budget + 3' tail protection
    ▼
  anchors (nonzero, cap ANCH) ─ 7. margin-window primer2 verify over all
    │                              2*margin+1 offsets at once (+ head 3'
    │                              protection), reference clamp semantics
    ▼
  hits (nonzero, cap HIT): pos1/pos2/entry + emission-order keys

Semantics notes (each is load-bearing for byte-identical output):
* A scan window is usable iff it contains no ambiguous base — provably
  equivalent to the reference's N-countdown (engine.py:462-478, 496-503):
  N==0 at pos p iff no AMBIG base in [p, p+W-1].
* Scan positions are partitioned across tiles (each position owned by
  exactly one tile), so cross-tile hits are never duplicated and no dedup
  pass is needed; halos only provide read-only context. Coordinates and
  end-of-sequence clamps are computed in GLOBAL record coordinates, so
  tiling is invisible to the output (unlike the reference's T>1 chunking
  bug, SURVEY.md §2.1 — we match its T=1 ground truth).
* Emission order: the reference appends hits scanning pos ascending, bucket
  slots in file order, and window offsets expected-first-then ±1, ±2, …
  (engine.py:543-593), then stable-sorts by pos1 (engine.py:434). We carry
  (pair_order, rank) keys per hit; the host sorts by
  (pos1, tile, pair_order, rank) to reproduce the exact order.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .encoding import AMBIG, iupac_exp_masks
from .table import DeviceTable

_EXP_NIB = iupac_exp_masks()[0]  # uint32[16] genome-letter expansion masks


def _exp_nib_select(sb: jnp.ndarray) -> jnp.ndarray:
    """EXP_NIB[sb] for 4-bit codes WITHOUT a gather: a 15-`where` binary
    select tree over broadcast constants (pure VPU; a per-element LUT
    gather here would dominate IUPAC-mode verify)."""
    e = [jnp.uint32(int(v)) for v in _EXP_NIB]
    sel = (sb & 1) != 0
    lvl = [jnp.where(sel, e[i + 1], e[i]) for i in range(0, 16, 2)]
    sel = (sb & 2) != 0
    lvl = [jnp.where(sel, lvl[i + 1], lvl[i]) for i in range(0, 8, 2)]
    sel = (sb & 4) != 0
    lvl = [jnp.where(sel, lvl[i + 1], lvl[i]) for i in range(0, 4, 2)]
    return jnp.where((sb & 8) != 0, lvl[1], lvl[0])


@dataclass(frozen=True)
class ScanConfig:
    """Static (compile-time) scan parameters."""

    wordsize: int
    margin: int  # margin CAP: sets window shapes; the actual -M value (and
    #              -N / -X, which affect no shapes) are RUNTIME scalars, so
    #              parameter sweeps share one compiled program
    iupac: bool  # -I: verify via 256x256 LUT; else arithmetic case-fold
    packed: bool  # genome shipped as 4-bit nibbles, 2 bases/byte
    stride: int  # packed path: scan positions covered per bloom lookup (2|4)
    qbloom_bits: int  # log2 bits of the mult-hashed group bloom
    tile_len: int  # scan positions per tile (L)
    lead: int  # left halo bytes  = max hash_offset over entries
    tail: int  # right halo bytes = max_pcr_size + margin
    p1_max: int
    p2_max: int
    bloom_bits: int
    cpos_cap: int
    cand_cap: int
    anch_cap: int
    hit_cap: int

    @property
    def tile_buf(self) -> int:
        """Tile buffer length in POSITIONS (bases)."""
        return self.lead + self.tile_len + self.tail

    @property
    def tile_buf_in(self) -> int:
        """Tile buffer length in INPUT BYTES (2 bases/byte when packed)."""
        return self.tile_buf // 2 if self.packed else self.tile_buf

    @property
    def n_ranks(self) -> int:
        return 2 * self.margin + 1

    def escalate(self, factor: int = 4) -> "ScanConfig":
        """Larger capacities for tiles that overflow the fixed buffers."""
        units = self.tile_len // self.stride if self.packed else self.tile_len
        return ScanConfig(
            **{
                **self.__dict__,
                "cpos_cap": min(self.cpos_cap * factor, units),
                "cand_cap": self.cand_cap * factor,
                "anch_cap": self.anch_cap * factor,
                "hit_cap": self.hit_cap * factor,
            }
        )


class ScanOut(NamedTuple):
    """Per-tile scan results (fixed capacity; *_total give true counts)."""

    c_total: jnp.ndarray  # int32 — candidate positions found
    pair_total: jnp.ndarray  # int32 — (pos, slot) pairs expanded
    anch_total: jnp.ndarray  # int32 — primer1-passing anchors
    hit_total: jnp.ndarray  # int32 — hits emitted
    pos1: jnp.ndarray  # int32[hit_cap] global 0-based anchor position
    pos2: jnp.ndarray  # int32[hit_cap] global 0-based amplicon end (inclusive)
    entry: jnp.ndarray  # int32[hit_cap] device entry index
    pair_order: jnp.ndarray  # int32[hit_cap] within-tile emission key (major)
    rank: jnp.ndarray  # int32[hit_cap] within-anchor emission key (minor)


def _byte_fold(b: jnp.ndarray) -> jnp.ndarray:
    """Uppercase-fold a byte vector arithmetically (ASCII letters only),
    matching the reference's ``.upper()`` comparisons (engine.py:631)."""
    is_lower = (b >= ord("a")) & (b <= ord("z"))
    return jnp.where(is_lower, b - 32, b)


def _encode_codes(tile_bytes: jnp.ndarray) -> jnp.ndarray:
    """Exact scode semantics (reference engine.py:102-109) without a gather:
    A/a->0 C/c->1 G/g->2 T/t/U/u->3, everything else AMBIG."""
    b = tile_bytes.astype(jnp.int32)
    folded = b | 32  # lowercase letters unchanged; uppercase -> lowercase
    is_letter = (folded >= ord("a")) & (folded <= ord("z"))
    b5 = b & 0x1F
    code = jnp.where(
        b5 == 1, 0,
        jnp.where(
            b5 == 3, 1,
            jnp.where(b5 == 7, 2, jnp.where((b5 == 20) | (b5 == 21), 3, AMBIG)),
        ),
    )
    return jnp.where(is_letter, code, AMBIG)


def _rank_invert(cnt: jnp.ndarray, cap_out: int):
    """Invert a monotone rank map with one scatter-max + cummax instead of
    a log-depth ``searchsorted`` (TPU gathers cost ~per-element, so
    searchsorted over ``cap_out`` lanes pays log2 gathers per lane; this
    pays ~2 memory ops per lane).

    ``cnt``: int32[S] non-negative counts per source. Output slot q in
    [0, sum(cnt)) belongs to the source i with
    excl[i] <= q < excl[i] + cnt[i], where excl is the exclusive prefix
    sum. Returns ``(src, excl_at_src)`` — both int32[cap_out]; entries at
    q >= sum(cnt) are garbage (callers mask by total).
    """
    S = cnt.shape[0]
    csum = jnp.cumsum(cnt)
    excl = csum - cnt
    # Scatter i+1 at excl[i] for every source with cnt>0 (their excl values
    # are strictly increasing, hence unique); empty sources go to the
    # out-of-bounds dump slot and are dropped.
    tgt = jnp.where(cnt > 0, excl, cap_out)
    ids = jnp.arange(1, S + 1, dtype=jnp.int32)
    seed = jnp.zeros((cap_out,), jnp.int32).at[tgt].max(ids, mode="drop")
    src = jnp.clip(jax.lax.cummax(seed, axis=0) - 1, 0, S - 1)
    return src, excl[src]


def _empty_out(cfg: ScanConfig) -> ScanOut:
    z = jnp.int32(0)
    zh = jnp.zeros((cfg.hit_cap,), jnp.int32)
    return ScanOut(z, z, z, z, zh, zh, zh, zh, zh)


def _scan_tile(
    cfg: ScanConfig,
    table: DeviceTable,
    tile_bytes: jnp.ndarray,  # uint8[TB]
    tile_start: jnp.ndarray,  # int32 scalar: global scan pos of local index 0
    n_scan: jnp.ndarray,  # int32 scalar: valid scan positions (<= tile_len)
    record_len: jnp.ndarray,  # int32 scalar: global record length
    rt: jnp.ndarray,  # int32[3]: runtime (-M margin <= cap, -N, -X)
) -> ScanOut:
    """Scan one tile; padding tiles (n_scan <= 0) short-circuit via cond."""
    return jax.lax.cond(
        n_scan > 0,
        lambda: _scan_tile_impl(
            cfg, table, tile_bytes, tile_start, n_scan, record_len, rt
        ),
        lambda: _empty_out(cfg),
    )


def _scan_tile_impl(
    cfg: ScanConfig,
    table: DeviceTable,
    tile_bytes: jnp.ndarray,
    tile_start: jnp.ndarray,
    n_scan: jnp.ndarray,
    record_len: jnp.ndarray,
    rt=None,  # int32[3] runtime (margin, mismatches, three_prime); None ->
    #           (cap, 0, 1) — only used by profiling harnesses
    stop: str | None = None,  # profiling hook: truncate after a stage
) -> ScanOut:
    def _stopped(*vals):
        acc = jnp.int32(0)
        for v in vals:
            acc = acc + jnp.sum(v.astype(jnp.int32))
        o = _empty_out(cfg)
        return o._replace(c_total=acc)
    W = cfg.wordsize
    L = cfg.tile_len
    LEAD = cfg.lead
    TB = cfg.tile_buf
    M = cfg.margin  # shape cap
    if rt is None:
        rt = jnp.asarray([M, 0, 1], dtype=jnp.int32)
    Mdyn, NMM, X = rt[0], rt[1], rt[2]
    R = cfg.n_ranks
    E = table.hash_offset.shape[0]
    U = table.uhash.shape[0]

    # ---- 0-3. hash + validity + occupancy flags ---------------------------
    def bloom_flag(h, pvalid):
        shift = 2 * W - cfg.bloom_bits  # >= 0
        bk = (h >> shift) if shift else h
        word = table.bloom[(bk >> 5).astype(jnp.int32)]
        return pvalid & (((word >> (bk & 31)) & 1) == 1)

    NW = L // 32
    if cfg.packed:
        # Stride-S front end: ONE mult-hashed bloom lookup covers S scan
        # positions. The packed plane is decoded once per tap UNIT (byte =
        # 2 bases for S=2; uint16 = 4 bases for S=4, via a free bitcast —
        # group starts are unit-aligned, so taps are CONSECUTIVE unit
        # slices and no strided relayout is ever needed; a stride-2 slice
        # costs as much as a gather, tools/gather_microbench3.py). A
        # 32-bit MSB-first group value A (+ spill B2 for 2(W+S-1) > 32) is
        # built from the taps; each phase's exact W-mer hash is derived
        # from (A, B2) arithmetically — there is no rolling hash at all.
        #
        # The bloom key is the group's first NB = min(16, W+S-1) bases;
        # table.py inserts, for every bucket key K and phase d, all NB-base
        # strings that contain K at offset d (prefixes x suffixes; K's own
        # prefix when the window is truncated at NB). A hit therefore
        # means "some phase of this group MAY anchor a bucket key"; the
        # per-phase exact CSR below removes all false positives, so this
        # stage only ever over-approximates (never drops) candidates.
        S_ = cfg.stride
        UB = 4 if S_ == 4 else 2  # bases per tap unit
        Q = L // S_  # groups per tile
        NB = min(16, W + S_ - 1)
        TFULL = -(-(W + S_ - 1) // UB)
        TA = 32 // (2 * UB)  # taps that fit in A

        if UB == 4:
            units = jax.lax.bitcast_convert_type(
                tile_bytes.reshape(-1, 2), jnp.uint16
            ).astype(jnp.uint32)
        else:
            units = tile_bytes.astype(jnp.uint32)
        # MSB-first 2-bit codes per unit; amb bits aligned with the codes
        # (dirty base -> its 2 code bits are garbage, its amb bits are 11)
        tv = jnp.zeros_like(units)
        av = jnp.zeros_like(units)
        for k in range(UB):  # base k of a unit lives in nibble k (LSB first)
            nib = (units >> (4 * k)) & 15
            sh = 2 * (UB - 1 - k)
            tv = tv | ((nib & 3) << sh)
            av = av | jnp.where(nib >= 4, jnp.uint32(3) << sh, jnp.uint32(0))

        u0 = LEAD // UB
        HAS_B2 = TFULL > TA  # spill word needed only when 2(W+S-1) > 32
        A = jnp.zeros((Q,), jnp.uint32)
        Aa = jnp.zeros((Q,), jnp.uint32)
        B2 = jnp.zeros((Q,), jnp.uint32) if HAS_B2 else jnp.uint32(0)
        B2a = jnp.zeros((Q,), jnp.uint32) if HAS_B2 else jnp.uint32(0)
        for j in range(min(TFULL, TA)):
            sh = 32 - 2 * UB * (j + 1)
            A = A | (jax.lax.dynamic_slice(tv, (u0 + j,), (Q,)) << sh)
            Aa = Aa | (jax.lax.dynamic_slice(av, (u0 + j,), (Q,)) << sh)
        for j in range(TA, TFULL):
            sh = 64 - 2 * UB * (j + 1)
            B2 = B2 | (jax.lax.dynamic_slice(tv, (u0 + j,), (Q,)) << sh)
            B2a = B2a | (jax.lax.dynamic_slice(av, (u0 + j,), (Q,)) << sh)
        # group state packed into rows: the expand stage fetches all 2|4
        # words per compacted group with ONE row gather
        gstate = jnp.stack(
            [A, Aa] + ([B2, B2a] if HAS_B2 else []), axis=-1
        )

        def phase_h(A_, B2_, d):
            """The W-mer value at phase d (bases d..d+W-1), in low 2W bits."""
            if d == 0 or not HAS_B2:
                x = A_ if d == 0 else (A_ << (2 * d))
            else:
                x = (A_ << (2 * d)) | (B2_ >> (32 - 2 * d))
            return x >> (32 - 2 * W)

        V = A >> (32 - 2 * NB)
        vclean = (Aa >> (32 - 2 * NB)) == 0
        glane = jax.lax.broadcasted_iota(jnp.int32, (Q,), 0)
        pv_any = jnp.zeros((Q,), jnp.bool_)
        for d in range(S_):
            pcl = phase_h(Aa, B2a, d) == 0
            pv_any = pv_any | (pcl & (glane * S_ + d < n_scan))
        if stop == "hash":
            return _stopped(A, Aa, V, pv_any)

        hq = (V * jnp.uint32(0x9E3779B1)) >> (32 - cfg.qbloom_bits)
        qword = table.qbloom[(hq >> 5).astype(jnp.int32)]
        hit = ((qword >> (hq & 31)) & 1) == 1
        # Groups whose NB-base span contains an ambiguous base skip the
        # bloom (its key would be garbage) and go straight to the exact
        # per-phase CSR — rare, and the phase validity masks there are
        # exact, so this only costs capacity near ambiguity runs.
        flag = pv_any & (hit | ~vclean)
        if stop == "bloom":
            return _stopped(flag)
        c_total = jnp.sum(flag.astype(jnp.int32))  # candidate GROUPS
        NWU = Q // 32
        fb = flag.reshape(NWU, 32).astype(jnp.uint32)
        wbits = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
        words = jnp.sum(fb << wbits, axis=1, dtype=jnp.uint32)
    else:
        codes = _encode_codes(tile_bytes)
        isamb = codes == AMBIG
        cc = jnp.where(isamb, 0, codes).astype(jnp.uint32)
        h = jnp.zeros((L,), dtype=jnp.uint32)
        amb = jnp.zeros((L,), dtype=jnp.bool_)
        for i in range(W):  # static unroll: W <= 16 shifted ORs (VPU)
            h = (h << 2) | jax.lax.dynamic_slice(cc, (LEAD + i,), (L,))
            amb = amb | jax.lax.dynamic_slice(isamb, (LEAD + i,), (L,))
        lane = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
        flag = bloom_flag(h, (~amb) & (lane < n_scan))
        c_total = jnp.sum(flag.astype(jnp.int32))
        NWU = NW
        fb = flag.reshape(NWU, 32).astype(jnp.uint32)
        wbits = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
        words = jnp.sum(fb << wbits, axis=1, dtype=jnp.uint32)

    # ---- 4. compact candidate units + exact CSR lookup --------------------
    # Hierarchical compaction: flags are packed into 32-bit words (cheap VPU
    # reduce), nonzero runs over the 32x-smaller word array, then the (rare)
    # non-empty words' bits are expanded. A word with any bit set implies
    # >= 1 candidate unit, so w_total <= c_total and cpos_cap bounds both —
    # no new overflow mode. Order (word asc, bit asc) == unit asc,
    # preserving the emission-order contract. A "unit" is a position-pair
    # in packed mode, a single position otherwise.
    (widx,) = jnp.nonzero(words != 0, size=cfg.cpos_cap, fill_value=NWU - 1)
    wordsel = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (cfg.cpos_cap,), 0)
        < jnp.sum((words != 0).astype(jnp.int32)),
        words[widx],
        0,
    )
    # Expand set bits to unit indices without a (cap x 32)-lane nonzero:
    # popcount prefix sums assign each output slot q its (word, rank), and
    # a 5-level binary search selects the rank-th set bit — all VPU ops.
    pc = jax.lax.population_count(wordsel).astype(jnp.int32)
    q = jax.lax.broadcasted_iota(jnp.int32, (cfg.cpos_cap,), 0)
    wsel, wexcl = _rank_invert(pc, cfg.cpos_cap)
    r = q - wexcl
    wq = wordsel[wsel]
    b = jnp.zeros_like(r)
    for half in (16, 8, 4, 2, 1):
        lowmask = jnp.uint32((1 << half) - 1)
        clow = jax.lax.population_count(wq & lowmask).astype(jnp.int32)
        go_hi = r >= clow
        b = b + jnp.where(go_hi, half, 0)
        r = r - jnp.where(go_hi, clow, 0)
        wq = jnp.where(go_hi, wq >> half, wq & lowmask)
    cpos = widx[wsel] * 32 + b  # ascending unit indices
    if stop == "compact":
        return _stopped(cpos)
    clane = jax.lax.broadcasted_iota(jnp.int32, (cfg.cpos_cap,), 0)
    cvalid = clane < c_total

    def exact_csr(hq, mask):
        """Exact bucket lookup; returns (start, count).

        W <= 11: ONE row gather into the dense (start, count) pair table
        (gather cost is per row — tools/gather_microbench2.py). W == 12:
        two gathers into bucket_start. Larger W: log2(U)-step binary
        search over sorted unique hashes."""
        if W <= 11:  # table.bsc is (4^W, 2) [start, count] rows
            sc = table.bsc[hq.astype(jnp.int32)]
            return sc[:, 0], jnp.where(mask, sc[:, 1], 0)
        if W == 12:  # table.bstart has 4^W + 1 entries
            hi = hq.astype(jnp.int32)
            start = table.bstart[hi]
            cnt = jnp.where(mask, table.bstart[hi + 1] - start, 0)
            return start, cnt
        u = jnp.searchsorted(table.uhash, hq)
        uc = jnp.clip(u, 0, U - 1)
        found = (u < U) & (table.uhash[uc] == hq) & mask
        start = table.ustart[uc]
        cnt = jnp.where(found, table.ustart[uc + 1] - start, 0)
        return start, cnt

    # ---- 5. (unit, slot) -> candidate expansion ---------------------------
    if cfg.packed:

        def plane_at(idx):
            """Gather 4-bit letter codes at (clipped) position indices."""
            ic = jnp.clip(idx, 0, TB - 1)
            pkb = tile_bytes[ic >> 1].astype(jnp.int32)
            return jnp.where((ic & 1) == 0, pkb & 15, pkb >> 4)

    else:

        def plane_at(idx):
            return tile_bytes[jnp.clip(idx, 0, TB - 1)].astype(jnp.int32)

    if cfg.packed:
        # Each compacted group contributes its phases' bucket candidates in
        # phase order d = 0..S-1 (ascending scan position — the emission-
        # order contract). Phase hashes come from the gathered group state
        # arithmetically; validity is re-derived per phase.
        gs = gstate[cpos]  # one row gather for A/Aa (+B2/B2a)
        Ac, Aac = gs[:, 0], gs[:, 1]
        B2c = gs[:, 2] if HAS_B2 else jnp.uint32(0)
        B2ac = gs[:, 3] if HAS_B2 else jnp.uint32(0)
        sts, cns = [], []
        for d in range(S_):
            phh = phase_h(Ac, B2c, d)
            pcl = phase_h(Aac, B2ac, d) == 0
            m = cvalid & pcl & (cpos * S_ + d < n_scan)
            st_d, cn_d = exact_csr(phh, m)
            sts.append(st_d)
            cns.append(cn_d)
        cnt = sum(cns)
        pair_total = jnp.sum(cnt)
        j = jax.lax.broadcasted_iota(jnp.int32, (cfg.cand_cap,), 0)
        srcc, jexcl = _rank_invert(cnt, cfg.cand_cap)
        pair_valid = j < pair_total
        slot = j - jexcl
        # per-phase (start, count) packed into one row per group, so the
        # phase-selection pass needs a single row gather at srcc
        stcn = jnp.stack(
            [x for d in range(S_) for x in (sts[d], cns[d])], axis=-1
        )[srcc]
        entry = jnp.zeros((cfg.cand_cap,), jnp.int32)
        ph_of = jnp.zeros((cfg.cand_cap,), jnp.int32)
        prev = jnp.zeros((cfg.cand_cap,), jnp.int32)
        for d in range(S_):
            cn = stcn[:, 2 * d + 1]
            inphase = (slot >= prev) & (slot < prev + cn)
            entry = jnp.where(inphase, stcn[:, 2 * d] + slot - prev, entry)
            ph_of = jnp.where(inphase, d, ph_of)
            prev = prev + cn
        entry = jnp.clip(entry, 0, E - 1)
        ppos = cpos[srcc] * S_ + ph_of
        if stop == "expand":
            return _stopped(entry, ppos)
    else:
        hc = h[cpos]
        start, cnt = exact_csr(hc, cvalid)
        pair_total = jnp.sum(cnt)
        j = jax.lax.broadcasted_iota(jnp.int32, (cfg.cand_cap,), 0)
        srcc, jexcl = _rank_invert(cnt, cfg.cand_cap)
        pair_valid = j < pair_total
        slot = j - jexcl
        entry = jnp.clip(start[srcc] + slot, 0, E - 1)
        ppos = cpos[srcc]  # local scan position of each unit
        if stop == "expand":
            return _stopped(entry, ppos)

    # ---- 6. primer1 verify (reference engine.py:486-515, 599-642 '+') -----
    em = table.emeta[entry]  # one row gather for all per-entry scalars
    hoff = em[:, 0]
    kg = tile_start + ppos - hoff  # global anchor
    kl = ppos - hoff + LEAD  # local buffer index of anchor
    l1 = em[:, 1]
    inb = (kg >= 0) & (kg + l1 <= record_len)  # engine.py:487

    ii = jax.lax.broadcasted_iota(jnp.int32, (cfg.cand_cap, cfg.p1_max), 1)
    if cfg.packed and TB % 32 == 0:
        # Row-gather verify: fetch the whole primer window as NR 16-byte
        # rows (per-ROW gather cost), then byte barrel-shift + nibble
        # interleave in lanes — replaces p1_max per-element gathers.
        RB = 16
        rows2d = tile_bytes.reshape(TB // 2 // RB, RB)
        spanb = cfg.p1_max // 2 + 1
        NR = -(-(RB - 1 + spanb) // RB)
        byte0 = kl >> 1
        row0 = byte0 >> 4
        g = rows2d[
            row0[:, None] + jax.lax.broadcasted_iota(jnp.int32, (1, NR), 1)
        ]
        x = g.reshape(cfg.cand_cap, NR * RB).astype(jnp.int32)
        boff = (byte0 & (RB - 1))[:, None]
        for k in (8, 4, 2, 1):  # barrel rotate left by boff bytes
            x = jnp.where((boff & k) != 0, jnp.roll(x, -k, axis=1), x)
        il = jnp.stack([x & 15, x >> 4], axis=-1).reshape(
            cfg.cand_cap, 2 * NR * RB
        )
        sb = jnp.where(
            ((kl & 1) == 0)[:, None],
            il[:, : cfg.p1_max],
            il[:, 1 : cfg.p1_max + 1],
        )
    else:
        sb = plane_at(kl[:, None] + ii)
    if cfg.packed:
        if cfg.iupac:  # expansion-set intersection, all-arithmetic
            m1 = (_exp_nib_select(sb) & table.p1_exp[entry]) != 0
        else:  # genome nibble == primer code (codes >= 16 never match)
            pb = table.p1_codes[entry].astype(jnp.int32)
            m1 = sb == pb
    else:
        pb = table.p1_bytes[entry].astype(jnp.int32)
        if cfg.iupac:
            m1 = table.match[sb * 256 + pb] != 0
        else:  # non-IUPAC match is exactly case-insensitive equality
            m1 = _byte_fold(sb) == _byte_fold(pb)
    act1 = ii < l1[:, None]
    mm1 = act1 & ~m1
    prot1 = ii >= (l1[:, None] - X)  # '+' strand: last X bases (engine.py:609)
    p1_ok = (
        pair_valid
        & inb
        & ~jnp.any(mm1 & prot1, axis=1)
        & (jnp.sum(mm1, axis=1) <= NMM)
    )
    if stop == "p1":
        return _stopped(p1_ok)

    # ---- compact anchors ---------------------------------------------------
    (a_idx,) = jnp.nonzero(p1_ok, size=cfg.anch_cap, fill_value=0)
    anch_total = jnp.sum(p1_ok.astype(jnp.int32))
    alane = jax.lax.broadcasted_iota(jnp.int32, (cfg.anch_cap,), 0)
    avalid = alane < anch_total

    ak = kg[a_idx]
    aentry = entry[a_idx]
    al1 = l1[a_idx]
    aem = table.emeta[aentry]
    al2 = aem[:, 2]
    aorder = a_idx  # pair index == within-tile emission major key

    # ---- 7. margin-window primer2 verify (engine.py:517-593) --------------
    exp0 = aem[:, 3]
    avail = record_len - (ak + al1)
    room = avail >= al2  # engine.py:524-525
    actual = record_len - ak  # engine.py:528
    clamped = exp0 > actual
    exp = jnp.where(clamped, actual, exp0)  # engine.py:531-535
    hi = jnp.where(clamped, 0, jnp.minimum(Mdyn, record_len - ak - exp))
    lo = jnp.clip(jnp.minimum(Mdyn, exp - al1 - al2), 0)  # engine.py:538-540

    # rank r -> window offset d: r=0 -> 0; odd r -> -(r+1)//2; even r -> r//2
    # (expected first, then -1, +1, -2, +2, … — engine.py:543-593)
    ranks = jax.lax.broadcasted_iota(jnp.int32, (R,), 0)
    dmag = (ranks + 1) // 2
    d = jnp.where(ranks % 2 == 1, -dmag, dmag)  # int32[R]

    p2 = ak[:, None] + exp[:, None] - al2[:, None] + d[None, :]
    struct = p2 + al2[:, None] <= record_len
    # k + len_p1 <= p2 is checked for d <= 0 only (engine.py:546, 568; the
    # hi loop at engine.py:581-583 omits it)
    struct &= jnp.where(d[None, :] <= 0, p2 >= ak[:, None] + al1[:, None], True)
    rmask = jnp.where(
        d[None, :] == 0,
        True,
        jnp.where(d[None, :] < 0, dmag[None, :] <= lo[:, None], dmag[None, :] <= hi[:, None]),
    )

    # gather the window region once per anchor, then compare all R shifts
    span = 2 * M + cfg.p2_max
    wbase_l = (ak + exp - al2 - M) - tile_start + LEAD
    jjj = jax.lax.broadcasted_iota(jnp.int32, (cfg.anch_cap, span), 1)
    wb = plane_at(wbase_l[:, None] + jjj)  # [ANCH, span]

    i2 = jax.lax.broadcasted_iota(jnp.int32, (R, cfg.p2_max), 1)
    off = M + d[:, None] + i2  # static-range offsets in [0, span)
    sb2 = wb[:, off]  # [ANCH, R, P2MAX] gather with statically-known indices
    if cfg.packed:
        if cfg.iupac:  # expansion-set intersection, all-arithmetic
            m2 = (
                _exp_nib_select(sb2) & table.p2_exp[aentry][:, None, :]
            ) != 0
        else:
            pb2 = table.p2_codes[aentry].astype(jnp.int32)
            m2 = sb2 == pb2[:, None, :]
    else:
        pb2 = table.p2_bytes[aentry].astype(jnp.int32)
        if cfg.iupac:
            m2 = table.match[sb2 * 256 + pb2[:, None, :]] != 0
        else:
            m2 = _byte_fold(sb2) == _byte_fold(pb2)[:, None, :]
    act2 = i2[None, :, :] < al2[:, None, None]
    mm2 = act2 & ~m2
    prot2 = i2[None, :, :] < X  # '-' strand: first X bases (engine.py:610-611)
    p2_ok = ~jnp.any(mm2 & prot2, axis=2) & (jnp.sum(mm2, axis=2) <= NMM)

    hitmask = avalid[:, None] & room[:, None] & rmask & struct & p2_ok

    # ---- hit emission ------------------------------------------------------
    flat = hitmask.reshape(-1)  # anchor-major, rank-minor == emission order
    (hidx,) = jnp.nonzero(flat, size=cfg.hit_cap, fill_value=0)
    hit_total = jnp.sum(flat.astype(jnp.int32))
    a_of = hidx // R
    r_of = hidx % R
    hp2 = p2[a_of, r_of]
    return ScanOut(
        c_total=c_total,
        pair_total=pair_total,
        anch_total=anch_total,
        hit_total=hit_total,
        pos1=ak[a_of],
        pos2=hp2 + al2[a_of] - 1,
        entry=aentry[a_of],
        pair_order=aorder[a_of],
        rank=r_of,
    )


@lru_cache(maxsize=64)
def get_scan_fn(cfg: ScanConfig):
    """One compiled tile-scan function per static config."""

    def f(table, tile_bytes, tile_start, n_scan, record_len, rt):
        return _scan_tile(
            cfg, table, tile_bytes, tile_start, n_scan, record_len, rt
        )

    return jax.jit(f)


@lru_cache(maxsize=64)
def get_record_scan_fn(cfg: ScanConfig, n_tiles: int):
    """Whole-record scan: ONE device call runs all tiles via lax.map over
    device-side dynamic slices of the halo-padded record buffer.

    This is the host/device split that matters on real hardware: shipping
    one record buffer and fetching one stacked result amortizes transfer +
    dispatch latency that would otherwise dominate (each tile's compute is
    ~0.3 ms; a per-tile host round trip is ~200 ms through a tunnel).

    padded layout: [lead zeros][record bytes][tail zeros / next bucket pad],
    total length lead + n_tiles*tile_len + tail. Tile t's buffer is the
    slice [t*L, t*L + tile_buf); padding tiles see n_scan <= 0 and emit
    nothing.
    """

    stride = cfg.tile_len // 2 if cfg.packed else cfg.tile_len

    def f(table, padded, start0, total_scan, record_len, rt):
        def body(t):
            tb = jax.lax.dynamic_slice(padded, (t * stride,), (cfg.tile_buf_in,))
            gstart = start0 + t * cfg.tile_len
            n_scan = jnp.clip(total_scan - gstart, 0, cfg.tile_len)
            return _scan_tile(cfg, table, tb, gstart, n_scan, record_len, rt)

        # sequential map: measured faster than vmap here (the L-wide hash /
        # bloom stages batch poorly; the backend stages are already small)
        return jax.lax.map(body, jnp.arange(n_tiles, dtype=jnp.int32))

    return jax.jit(f)


def margin_cap(margin: int) -> int:
    """Shape cap for a runtime margin: next multiple of 64, so nearby
    margins (e.g. a 50..100 sweep) share one compiled program."""
    return max(64, -(-margin // 64) * 64)


def default_config(
    wordsize: int,
    margin: int,
    mismatches: int,
    three_prime_match: int,
    lead: int,
    max_pcr_size: int,
    p1_max: int,
    p2_max: int,
    bloom_bits: int,
    tile_len: int = 1 << 19,
    n_entries: int = 0,
    iupac: bool = False,
    packed: bool = True,
    stride: int = 2,
    qbloom_bits: int = 22,
    n_unique: int = 0,
) -> ScanConfig:
    """Capacity heuristics.

    The verify stages cost ~O(cap), so capacities are sized from the
    expected table hit density (E entries spread over 4^W buckets => about
    L*E/4^W candidate positions per tile) with generous headroom; the rare
    tile that still overflows is retried with escalated capacities, so
    undersizing costs a retry, never correctness.
    """
    # The margin is a RUNTIME value; shapes use the bucketed cap so nearby
    # margins share one compiled program AND one buffer geometry (device
    # plane caches stay warm across parameter sweeps).
    # lead rounded to 32 positions = 16 packed bytes, so the tile buffer
    # reshapes exactly into the verify stage's 16-byte rows.
    mcap = margin_cap(margin)
    lead = -(-lead // 32) * 32
    tail = -(-(max_pcr_size + mcap) // 256) * 256
    # Candidate-unit expectation. Real bucket hits ~ L*E/4^W; pair mode adds
    # ~4 predecessor bits/key of false positives over L/2 pairs. Escalation
    # recompiles are far more expensive than slack capacity, so size with
    # ~1.6x headroom over the estimate.
    E = max(n_entries, 1)
    E1 = max(n_unique, 1)
    p_real = E / float(4**wordsize)
    # the occupancy bitmask is exact when it covers all 2W hash bits;
    # truncation false positives only exist for W > bloom_bits/2
    trunc_fp = E / float(1 << bloom_bits) if bloom_bits < 2 * wordsize else 0.0
    if packed:
        # group flagged if mult-hash FP or any of its S phases is a real
        # bucket key (the per-phase CSR then rejects FPs exactly)
        fp_q = min(1.0, stride * 4 ** (stride - 1) * E1 / float(1 << qbloom_bits))
        p_unit = fp_q + min(1.0, stride * p_real)
        units = tile_len // stride
    else:
        p_unit = p_real + trunc_fp
        units = tile_len
    expect_units = int(units * min(p_unit, 1.0))
    # E[sum of bucket counts] over the tile is exactly L * E / 4^W
    expect_cands = int(tile_len * (p_real + trunc_fp))
    cpos_cap = min(max(1024, int(1.5 * expect_units) + 256), units)
    cand_cap = min(max(2048, int(1.3 * expect_cands) + 512), 4 * tile_len)
    return ScanConfig(
        wordsize=wordsize,
        margin=mcap,
        iupac=iupac,
        packed=packed,
        stride=stride,
        qbloom_bits=qbloom_bits,
        tile_len=tile_len,
        lead=lead,
        tail=tail,
        p1_max=p1_max,
        p2_max=p2_max,
        bloom_bits=bloom_bits,
        cpos_cap=cpos_cap,
        cand_cap=cand_cap,
        anch_cap=64,
        hit_cap=128,
    )
