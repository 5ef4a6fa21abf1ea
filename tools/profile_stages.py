"""Per-stage timing of the tile scan pipeline using on-device loop chaining
(one dispatch runs N iterations; avoids the axon tunnel RTT polluting
measurements)."""

import sys, os, time, tempfile, random
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp
from merpcr_tpu.ops import scan as S
from merpcr_tpu.ops.table import compile_table
from merpcr_tpu.io.sts import STSLoader
from merpcr_tpu.ops.encoding import AMBIG

rng = random.Random(0)
td = tempfile.mkdtemp(); sp = os.path.join(td, "b.sts")
with open(sp, "w") as fh:
    for i in range(1000):
        p1 = "".join(rng.choices("ACGT", k=22))
        p2 = "".join(rng.choices("ACGT", k=22))
        fh.write(f"S{i}\t{p1}\t{p2}\t{rng.randrange(100,400)}\n")
res = STSLoader.load_file(sp, 11, 240)
table, meta = compile_table(res, 11, False)
L = 1 << 19
cfg = S.default_config(11, 50, 0, 1, meta.lead, res.max_pcr_size, meta.p1_max,
                       meta.p2_max, meta.bloom_bits, tile_len=L, n_entries=meta.n_entries)
print("caps:", cfg.cpos_cap, cfg.cand_cap, cfg.anch_cap, cfg.hit_cap)
W, LEAD, TB = cfg.wordsize, cfg.lead, cfg.tile_buf
X, NMM, M, R = cfg.three_prime_match, cfg.mismatches, cfg.margin, cfg.n_ranks
E = table.hash_offset.shape[0]; U = table.uhash.shape[0]
seq = np.frombuffer(bytes(rng.choices(b"ACGT", k=TB)), np.uint8).copy()
tbd = jax.device_put(seq)
N = 20

def timeit(name, body):
    def outer(tb):
        def it(i, acc):
            tb2 = tb ^ (acc & 1).astype(jnp.uint8)
            return acc + body(tb2)
        return jax.lax.fori_loop(0, N, it, jnp.int32(0))
    f = jax.jit(outer)
    _ = jax.device_get(f(tbd))
    t0 = time.perf_counter()
    _ = jax.device_get(f(tbd))
    dt = (time.perf_counter() - t0 - 0.05) / N
    print(f"{name:20s} {dt*1e3:9.3f} ms/tile  {L/dt/1e6:8.0f} Mbp/s")

n_scan = jnp.int32(L); record_len = jnp.int32(10_000_000); tile_start = jnp.int32(0)

def upto(tb, stage):
    codes = S._encode_codes(tb)
    isamb = codes == AMBIG
    cc = jnp.where(isamb, 0, codes).astype(jnp.uint32)
    h = jnp.zeros((L,), jnp.uint32); amb = jnp.zeros((L,), jnp.bool_)
    for i in range(W):
        h = (h << 2) | jax.lax.dynamic_slice(cc, (LEAD + i,), (L,))
        amb = amb | jax.lax.dynamic_slice(isamb, (LEAD + i,), (L,))
    lane = jax.lax.broadcasted_iota(jnp.int32, (L,), 0)
    pvalid = (~amb) & (lane < n_scan)
    if stage == "hash":
        return jnp.sum(h).astype(jnp.int32)
    word = table.bloom[(h >> 5).astype(jnp.int32)]
    flag = pvalid & (((word >> (h & 31)) & 1) == 1)
    if stage == "bloom":
        return jnp.sum(flag.astype(jnp.int32))
    cpos, = jnp.nonzero(flag, size=cfg.cpos_cap, fill_value=0)
    c_total = jnp.sum(flag.astype(jnp.int32))
    clane = jax.lax.broadcasted_iota(jnp.int32, (cfg.cpos_cap,), 0)
    cvalid = clane < c_total
    if stage == "nonzero":
        return jnp.sum(cpos).astype(jnp.int32)
    hc = h[cpos]
    u = jnp.searchsorted(table.uhash, hc)
    uc = jnp.clip(u, 0, U - 1)
    found = (u < U) & (table.uhash[uc] == hc)
    start = table.ustart[uc]
    cnt = jnp.where(found & cvalid, table.ustart[uc + 1] - start, 0)
    if stage == "csr":
        return jnp.sum(cnt).astype(jnp.int32)
    csum = jnp.cumsum(cnt)
    pair_total = csum[-1]
    j = jax.lax.broadcasted_iota(jnp.int32, (cfg.cand_cap,), 0)
    src = jnp.searchsorted(csum, j, side="right")
    pair_valid = j < pair_total
    srcc = jnp.clip(src, 0, cfg.cpos_cap - 1)
    slot = j - (csum[srcc] - cnt[srcc])
    entry = jnp.clip(start[srcc] + slot, 0, E - 1)
    ppos = cpos[srcc]
    if stage == "pairs":
        return jnp.sum(entry).astype(jnp.int32)
    hoff = table.hash_offset[entry]
    kg = tile_start + ppos - hoff
    kl = ppos - hoff + LEAD
    l1 = table.p1_len[entry]
    inb = (kg >= 0) & (kg + l1 <= record_len)
    ii = jax.lax.broadcasted_iota(jnp.int32, (cfg.cand_cap, cfg.p1_max), 1)
    sidx = jnp.clip(kl[:, None] + ii, 0, TB - 1)
    sb = tb[sidx].astype(jnp.int32)
    pb = table.p1_bytes[entry].astype(jnp.int32)
    m1 = table.match[sb * 256 + pb]
    act1 = ii < l1[:, None]
    mm1 = act1 & (m1 == 0)
    prot1 = ii >= (l1[:, None] - X)
    p1_ok = pair_valid & inb & ~jnp.any(mm1 & prot1, axis=1) & (jnp.sum(mm1, axis=1) <= NMM)
    if stage == "p1":
        return jnp.sum(p1_ok.astype(jnp.int32))
    return None

def full(tb):
    o = S._scan_tile(cfg, table, tb, tile_start, n_scan, record_len)
    return (o.c_total + o.pair_total + o.anch_total + o.hit_total + jnp.sum(o.pos1)).astype(jnp.int32)

for st in ["hash", "bloom", "nonzero", "csr", "pairs", "p1"]:
    timeit(st, lambda tb, st=st: upto(tb, st))
timeit("FULL", full)
