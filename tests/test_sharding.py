"""Multi-device sharding tests: shard-count invariance + halo boundary
correctness on a virtual 8-device CPU mesh (SURVEY.md §4 oracle pattern:
the reference validates its process-pool parallelism purely by T=1 vs T=N
output equality; we do the same for mesh shards — and unlike the reference's
buggy T>1 dedup, ours must be exactly equal)."""

import numpy as np
import pytest

import jax

import merpcr_tpu
from merpcr_tpu.parallel import make_mesh
from .conftest import GOLDEN_FA, GOLDEN_STS, needs_golden, run_search

pytestmark = pytest.mark.parallel

P1 = "GGCTCAGAGTATTTGGGATG"
P2 = "CTCTTGGAATCCTATCTCACTG"


def _engine(tmp_path, mesh=None, tile_len=None):
    eng = merpcr_tpu.MerPCR()
    sts = tmp_path / "s.sts"
    sts.write_text(f"S1\t{P1}\t{P2}\t200\tAL\n")
    assert eng.load_sts_file(str(sts))
    if mesh is not None:
        eng.use_mesh(mesh)
    if tile_len:
        eng._tile_len_override = tile_len
    return eng


def _genome_with_boundary_hits(n, tile, seed=5):
    rng = np.random.default_rng(seed)
    g = list("".join(rng.choice(list("ACGT"), size=n)))
    amp = list("".join(rng.choice(list("ACGT"), size=200)))
    amp[: len(P1)] = P1
    amp[200 - len(P2) :] = P2
    amp = "".join(amp)
    # plant hits exactly at shard/tile boundaries (SURVEY.md §5: the
    # reference's own stress tests miss these; we target them)
    for s in [0, tile - 1, tile, 2 * tile - 100, 4 * tile + 1, n - 200]:
        s = min(s, n - 200)
        g[s : s + 200] = amp
    return "".join(g)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multiple devices")
class TestShardInvariance:
    def test_1_vs_8_shards(self, tmp_path):
        tile = 2048
        g = _genome_with_boundary_hits(8 * tile + 531, tile)
        fa = tmp_path / "g.fa"
        fa.write_text(f">g\n{g}\n")

        single = _engine(tmp_path, tile_len=tile)
        recs = single.load_fasta_file(str(fa))
        out1 = run_search(single, recs)

        for n_dev in (2, 4, 8):
            if jax.device_count() < n_dev:
                continue
            mesh = make_mesh(jax.devices()[:n_dev])
            sharded = _engine(tmp_path, mesh=mesh, tile_len=tile)
            recs = sharded.load_fasta_file(str(fa))
            outn = run_search(sharded, recs)
            assert outn == out1, f"{n_dev}-shard output differs"
        assert len(out1.splitlines()) >= 5

    @needs_golden
    def test_golden_sharded(self, tmp_path):
        mesh = make_mesh()
        eng = merpcr_tpu.MerPCR().use_mesh(mesh)
        eng._tile_len_override = 8192
        assert eng.load_sts_file(GOLDEN_STS)
        recs = eng.load_fasta_file(GOLDEN_FA)
        out = run_search(eng, recs)
        assert out.splitlines()[0].startswith("L78833\t75823..76023\tAFM248yg9")
        assert len(out.splitlines()) == 1


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs multiple devices")
    ge.dryrun_multichip(n)


def test_entry_entrypoint():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    # _demo_sequence plants three DEMO1 amplicons inside the entry tile
    # (positions 1000 (+), 3000 (-), 4036 (+)); all must be found.
    assert int(out.hit_total) == 3
