#!/usr/bin/env python3
"""Dependency validation (parity with the reference's
scripts/dependency_validation.py): import / version / platform checks with a
JSON report. The TPU build's dependency surface is jax + numpy (+ optional
g++ for the native codec); everything else is stdlib.
"""

from __future__ import annotations

import importlib
import json
import os
import platform
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_import(name, min_version=None):
    entry = {"module": name, "ok": False, "version": None, "error": None}
    try:
        mod = importlib.import_module(name)
        entry["ok"] = True
        entry["version"] = getattr(mod, "__version__", "unknown")
        if min_version and entry["version"] != "unknown":
            have = tuple(int(x) for x in entry["version"].split(".")[:2] if x.isdigit())
            want = tuple(int(x) for x in min_version.split(".")[:2])
            if have and have < want:
                entry["ok"] = False
                entry["error"] = f"version {entry['version']} < required {min_version}"
    except Exception as e:
        entry["error"] = str(e)
    return entry


def main() -> int:
    report = {
        "python": platform.python_version(),
        "python_ok": sys.version_info >= (3, 11),
        "platform": platform.platform(),
        "checks": [
            check_import("numpy", "1.24"),
            check_import("jax", "0.4"),
            check_import("merpcr_tpu"),
        ],
        "native_toolchain": {
            "g++": shutil.which("g++") is not None,
        },
    }
    try:
        import jax

        report["jax_backend"] = jax.default_backend()
        report["jax_devices"] = [str(d) for d in jax.devices()]
    except Exception as e:
        report["jax_backend"] = f"error: {e}"

    try:
        from merpcr_tpu.native import get_lib

        report["native_codec"] = get_lib() is not None
    except Exception as e:
        report["native_codec"] = f"error: {e}"

    ok = report["python_ok"] and all(c["ok"] for c in report["checks"])
    report["ok"] = ok
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
