"""Test configuration: force an 8-device virtual CPU platform (SURVEY.md §4:
shard-count invariance is validated on virtual devices, no pod needed).

Set MERPCR_TEST_BACKEND=tpu to run the suite on real hardware instead.
"""

import io
import os
import sys
from contextlib import redirect_stdout

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Disable the persistent XLA compile cache for the suite (and for CLI
# subprocesses it spawns, via inherited env): jaxlib 0.9.0 CPU executable
# (de)serialization segfaults sporadically after hundreds of compilations
# in one process. See merpcr_tpu/utils/cache.py.
os.environ.setdefault("MERPCR_TPU_CACHE", "0")

import jax  # noqa: E402

if os.environ.get("MERPCR_TEST_BACKEND", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
        # Drop any boot-time-registered remote-TPU plugin ('axon' on this
        # dev box) before backends initialize: a stale device lease there
        # blocks the first jax.devices() for ~25 min even on CPU runs.
        # The Makefile blanks the gate env for test targets; this covers
        # bare `pytest` invocations too.
        import jax._src.xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

REFERENCE_ROOT = "/root/reference"
_DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
GOLDEN_STS = os.path.join(_DATA, "test.sts")
GOLDEN_FA = os.path.join(_DATA, "test.fa")
GOLDEN_LINE = "L78833\t75823..76023\tAFM248yg9\t(D17S932)  Chr.17, 63.7 cM\t(-)"

have_golden = os.path.exists(GOLDEN_STS)
have_oracle = os.path.isdir(os.path.join(REFERENCE_ROOT, "src"))

needs_golden = pytest.mark.skipif(not have_golden, reason="golden data not mounted")
needs_oracle = pytest.mark.skipif(not have_oracle, reason="reference not mounted")


def run_search(engine, records) -> str:
    """Capture an engine's stdout hit report."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        engine.search(records, None)
    return buf.getvalue()


def oracle_engine(**params):
    """Instantiate the reference implementation (oracle)."""
    sys.path.insert(0, os.path.join(REFERENCE_ROOT, "src"))
    import merpcr as ref

    return ref.MerPCR(**params)


@pytest.fixture
def tmp_sts(tmp_path):
    def make(content: str) -> str:
        p = tmp_path / "t.sts"
        p.write_text(content)
        return str(p)

    return make


@pytest.fixture
def tmp_fa(tmp_path):
    def make(content: str) -> str:
        p = tmp_path / "t.fa"
        p.write_text(content)
        return str(p)

    return make
