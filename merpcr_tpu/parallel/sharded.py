"""Mesh-sharded genome scan (the TPU-native replacement for the reference's
ProcessPoolExecutor halo chunking, engine.py:381-431).

Strategy (SURVEY.md §2.2/§2.3): scan positions of a record are partitioned
into contiguous spans, one span per device along a 1-D 'shard' mesh axis.
Each device receives its halo-padded byte buffer (halos are materialized
read-only overlaps — communication-free, like the reference's chunking) and
the W-mer table replicated; per-shard hit buffers are merged with a single
``lax.all_gather`` over the mesh (the only collective this workload needs).

Because scan positions are partitioned (not overlapped), no dedup pass is
required and output ordering is reproduced exactly by sorting on global
(pos1, shard, tile, pair, rank) keys — matching the reference's T=1 ground
truth rather than its buggy T>1 overlap filter (SURVEY.md §2.1).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.scan import ScanConfig, _scan_tile
from ..ops.table import DeviceTable


def make_mesh(devices=None, axis: str = "shard") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


@lru_cache(maxsize=32)
def _get_sharded_fn(cfg: ScanConfig, n_shards: int, tiles_per_shard: int,
                    axis: str = "shard"):
    """Compiled shard_map program: every shard scans its tiles_per_shard
    tiles, then all shards all-gather the stacked hit buffers."""

    stride = cfg.tile_len // 2 if cfg.packed else cfg.tile_len

    def per_shard(table, padded, tile_start0, total_scan, record_len, rt):
        padded = padded[0]  # (buf,)
        start0 = tile_start0[0]

        def body(t):
            tb = jax.lax.dynamic_slice(padded, (t * stride,), (cfg.tile_buf_in,))
            gstart = start0 + t * cfg.tile_len
            n_scan = jnp.clip(total_scan - gstart, 0, cfg.tile_len)
            return _scan_tile(cfg, table, tb, gstart, n_scan, record_len, rt)

        out = jax.lax.map(body, jnp.arange(tiles_per_shard, dtype=jnp.int32))
        # (tiles, ...) -> gathered (n_shards, tiles, ...), replicated
        return jax.tree.map(lambda x: jax.lax.all_gather(x, axis), out)

    def run(mesh, table, padded_shards, tile_start0, total_scan, record_len, rt):
        fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return fn(table, padded_shards, tile_start0, total_scan, record_len, rt)

    return jax.jit(run, static_argnums=0)


def shard_planes(
    cfg: ScanConfig, seq: np.ndarray, wordsize: int, n_shards: int
):
    """Host-side prep: cut a record into per-shard halo-padded byte planes.

    Returns (padded_shards uint8[n_shards, buf], tile_start0 int32[n_shards],
    total_scan, tiles_per_shard). Separated from the device dispatch so
    benchmarks can time the sharded program without this serial O(genome)
    NumPy cost (tools/scaling_report.py)."""
    n = len(seq)
    total_scan = n - wordsize + 1
    L = cfg.tile_len
    n_tiles = -(-total_scan // L)
    tiles_per_shard = -(-n_tiles // n_shards)
    span = tiles_per_shard * L  # scan positions per shard

    from ..ops.encoding import NIB_LUT, pack_nibbles

    pos_len = cfg.lead + span + cfg.tail
    buf_len = pos_len // 2 if cfg.packed else pos_len
    padded_shards = np.zeros((n_shards, buf_len), dtype=np.uint8)
    tile_start0 = np.zeros((n_shards,), dtype=np.int32)
    for s in range(n_shards):
        gstart = s * span  # first scan position owned by shard s
        tile_start0[s] = gstart
        src0 = gstart - cfg.lead
        a = max(0, src0)
        b = min(n, src0 + pos_len)
        pos = np.zeros(pos_len, dtype=np.uint8)
        if b > a:
            chunk = seq[a:b]
            pos[a - src0 : b - src0] = NIB_LUT[chunk] if cfg.packed else chunk
        padded_shards[s] = pack_nibbles(pos) if cfg.packed else pos
    return padded_shards, tile_start0, total_scan, tiles_per_shard


@lru_cache(maxsize=32)
def _get_sharded_stream_fn(cfg: ScanConfig, n_shards: int,
                           tiles_per_shard: int, axis: str = "shard"):
    """Compiled shard_map program for STREAM planes (cfg.stream): tiles of
    a concatenated multi-record plane partitioned across shards, rmeta
    replicated, hit buffers all-gathered."""

    stride = cfg.tile_len // 2 if cfg.packed else cfg.tile_len

    def per_shard(table, padded, tile_start0, total_scan, stream_len,
                  rmeta, recmap, rt):
        padded = padded[0]
        start0 = tile_start0[0]

        def body(t):
            tb = jax.lax.dynamic_slice(padded, (t * stride,), (cfg.tile_buf_in,))
            gstart = start0 + t * cfg.tile_len
            n_scan = jnp.clip(total_scan - gstart, 0, cfg.tile_len)
            return _scan_tile(cfg, table, tb, gstart, n_scan, stream_len,
                              rt, rmeta=rmeta, recmap=recmap)

        out = jax.lax.map(body, jnp.arange(tiles_per_shard, dtype=jnp.int32))
        return jax.tree.map(lambda x: jax.lax.all_gather(x, axis), out)

    def run(mesh, table, padded_shards, tile_start0, total_scan,
            stream_len, rmeta, recmap, rt):
        fn = jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(), P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
        return fn(table, padded_shards, tile_start0, total_scan,
                  stream_len, rmeta, recmap, rt)

    return jax.jit(run, static_argnums=0)


def shard_stream_planes(cfg: ScanConfig, plane: np.ndarray,
                        total_scan: int, n_shards: int):
    """Cut a prebuilt stream plane (lead + positions + tail, packed bytes)
    into per-shard halo-padded slices. Returns
    (padded_shards, tile_start0, tiles_per_shard)."""
    L = cfg.tile_len
    n_tiles = -(-total_scan // L)
    tiles_per_shard = -(-n_tiles // n_shards)
    span = tiles_per_shard * L
    d = 2 if cfg.packed else 1
    buf_len = (cfg.lead + span + cfg.tail) // d
    padded_shards = np.zeros((n_shards, buf_len), dtype=np.uint8)
    tile_start0 = np.zeros((n_shards,), dtype=np.int32)
    for s in range(n_shards):
        gstart = s * span
        tile_start0[s] = gstart
        # plane position of scan pos p is lead + p: shard s's buffer
        # starts at plane position gstart (== lead + gstart - lead)
        a = gstart // d
        chunk = plane[a : a + buf_len]
        padded_shards[s, : len(chunk)] = chunk
    return padded_shards, tile_start0, tiles_per_shard


def sharded_scan_stream(
    cfg: ScanConfig,
    table: DeviceTable,
    plane: np.ndarray,
    rmeta: np.ndarray,
    total_scan: int,
    stream_len: int,
    mesh: Mesh,
    axis: str = "shard",
    rt: np.ndarray | None = None,
    recmap: np.ndarray | None = None,
):
    """Scan a concatenated multi-record stream plane across a device mesh.

    Returns (out, n_shards, tiles_per_shard); out leaves are
    (n_shards, tiles_per_shard, ...) with global tile = shard * tps + t.
    """
    if rt is None:
        rt = np.asarray([cfg.margin, 0, 1], dtype=np.int32)
    if recmap is None:
        # block->record map (see engine._dispatch_stream): starts 8-aligned
        n_blocks = -(-stream_len // 8)
        live = rmeta[:, 0] != np.iinfo(np.int32).max
        counts = np.diff(
            rmeta[live, 0].astype(np.int64) // 8, append=n_blocks
        )
        recmap = np.repeat(
            np.arange(int(live.sum()), dtype=np.int32), counts
        )
    n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    padded_shards, tile_start0, tps = shard_stream_planes(
        cfg, plane, total_scan, n_shards
    )
    fn = _get_sharded_stream_fn(cfg, n_shards, tps, axis)
    out = fn(mesh, table, padded_shards, tile_start0,
             np.int32(total_scan), np.int32(stream_len), rmeta, recmap, rt)
    return out, n_shards, tps


def sharded_scan_record(
    cfg: ScanConfig,
    table: DeviceTable,
    seq: np.ndarray,
    wordsize: int,
    mesh: Mesh,
    axis: str = "shard",
    rt: np.ndarray | None = None,
):
    """Scan one record across a device mesh.

    Returns (out, n_shards, tiles_per_shard) where out leaves are shaped
    (n_shards, tiles_per_shard, ...) — global tile index = shard * tiles + t,
    matching single-device tile ordering exactly.
    """
    if rt is None:
        rt = np.asarray([cfg.margin, 0, 1], dtype=np.int32)
    n_shards = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    padded_shards, tile_start0, total_scan, tiles_per_shard = shard_planes(
        cfg, seq, wordsize, n_shards
    )
    fn = _get_sharded_fn(cfg, n_shards, tiles_per_shard, axis)
    out = fn(mesh, table, padded_shards, tile_start0,
             np.int32(total_scan), np.int32(len(seq)), rt)
    return out, n_shards, tiles_per_shard
