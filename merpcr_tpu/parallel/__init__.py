"""Multi-chip parallelism: mesh-sharded genome scan with all-gather merge."""

from .distributed import global_mesh, initialize, is_output_host
from .sharded import make_mesh, sharded_scan_record

__all__ = [
    "make_mesh",
    "sharded_scan_record",
    "initialize",
    "global_mesh",
    "is_output_host",
]
