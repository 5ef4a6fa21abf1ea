"""Multi-chip parallelism: mesh-sharded genome scan with all-gather merge."""

from .sharded import make_mesh, sharded_scan_record

__all__ = ["make_mesh", "sharded_scan_record"]
