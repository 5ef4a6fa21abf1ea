"""Persistent XLA compilation cache setup.

The scan pipeline compiles one program per (parameters, table shape, tile
length) combination; caching compiled artifacts on disk makes repeat CLI
runs and test sessions start fast.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache() -> None:
    global _ENABLED
    if _ENABLED:
        return
    # MERPCR_TPU_CACHE=0 disables the persistent cache (isolation /
    # debugging knob). Note for long many-compilation processes: each
    # loaded executable mmaps ~9+ regions, and a process that compiles or
    # deserializes thousands of programs can cross the kernel's
    # vm.max_map_count, which jaxlib 0.9.0 does not survive gracefully —
    # call jax.clear_caches() periodically (see tests/conftest.py).
    if os.environ.get("MERPCR_TPU_CACHE", "1") == "0":
        _ENABLED = True
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "MERPCR_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "merpcr_tpu_xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
    except Exception:  # pragma: no cover - cache is best-effort
        pass
