"""Produce SCALING.json — the committed multi-chip perf evidence.

Two sections (VERDICT r4 #2: every README/CHANGELOG perf number must
trace to a committed artifact):

* ``mesh_parity_tpu``: the engine's full search path with NO mesh vs a
  1-device mesh on the real TPU chip — the mesh machinery's overhead on
  identical hardware (the CHANGELOG's "1.8% overhead" claim).
* ``shard_scaling_cpu``: tools/scaling_report.py on a virtual 8-device
  CPU mesh — validates the sharded program functionally at 1/2/4/8
  shards (wall-clock efficiency on virtual devices shares one host's
  cores; see the note scaling_report prints).

Usage (on the TPU dev box):  timeout 1800 python tools/make_scaling_artifact.py
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys
import tempfile
import time
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def mesh_parity(mbp: float = 47.0, nsts: int = 1000, repeat: int = 5):
    import jax

    import bench
    import merpcr_tpu
    from merpcr_tpu.parallel import make_mesh

    td = tempfile.mkdtemp()
    sts_path, fa_path, n = bench.gen_data(td, mbp, nsts)

    def timed(eng):
        recs = eng.load_fasta_file(fa_path)
        with redirect_stdout(io.StringIO()):
            eng.search(recs, None)  # compile + warm
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            with redirect_stdout(io.StringIO()):
                eng.search(recs, None)
            best = min(best, time.perf_counter() - t0)
        return best

    eng = merpcr_tpu.MerPCR()
    assert eng.load_sts_file(sts_path)
    t_plain = timed(eng)

    eng_m = merpcr_tpu.MerPCR()
    assert eng_m.load_sts_file(sts_path)
    eng_m.use_mesh(make_mesh(jax.devices()[:1]))
    t_mesh = timed(eng_m)

    return {
        "backend": jax.default_backend(),
        "genome_mbp": mbp,
        "n_sts": nsts,
        "no_mesh_s": round(t_plain, 4),
        "mesh1_s": round(t_mesh, 4),
        "mesh_overhead_pct": round((t_mesh / t_plain - 1.0) * 100, 1),
    }


def shard_scaling():
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "tools", "scaling_report.py"),
         "--devices", "8"],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    sys.stderr.write(r.stderr)
    r.check_returncode()
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    art = {
        "mesh_parity_tpu": mesh_parity(),
        "shard_scaling_cpu": shard_scaling(),
    }
    out = os.path.join(HERE, "SCALING.json")
    with open(out, "w") as fh:
        json.dump(art, fh, indent=1)
    print(json.dumps(art))


if __name__ == "__main__":
    main()
