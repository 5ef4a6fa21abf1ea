"""FASTA loading, vectorized for whole-genome inputs.

Behavioral contract mirrors the reference ``src/merpcr/io/fasta.py:19-71``:

* empty file -> error log + ``[]``            (fasta.py:32-34)
* a stripped line starting with '>' begins a new record (fasta.py:49-57)
* sequence lines keep only characters whose uppercase is in
  ``ACGTBDHKMNRSVWXY``, original case preserved (fasta.py:60)
* blank lines are skipped (fasta.py:46-47)
* label = first word of the defline sans '>'  (models.py:40-49)

Unlike the reference's per-character Python loop, the filter runs once per
record as a NumPy boolean gather over the joined byte buffer (identical
result: the filter is per-character and newlines/whitespace are removed by
the line split/strip in both implementations).
"""

from __future__ import annotations

import logging
import os
import time
from typing import List

import numpy as np

from ..models import FASTARecord
from ..ops.encoding import FASTA_KEEP

logger = logging.getLogger(__name__)


class FASTALoader:
    """FASTA file loader (API parity with reference fasta.py:15-71)."""

    @staticmethod
    def load_file(filename: str) -> List[FASTARecord]:
        start_time = time.time()
        file_size = os.path.getsize(filename)

        if file_size == 0:
            logger.error(f"FASTA file '{filename}' is empty")
            return []

        logger.info(f"Reading FASTA file: {filename}")

        records: List[FASTARecord] = []
        with open(filename, "rb") as fh:
            data = fh.read()

        defline: str | None = None
        parts: list[bytes] = []

        from ..native import fasta_filter

        def flush():
            if defline is None:
                return
            raw = np.frombuffer(b"".join(parts), dtype=np.uint8)
            filtered = fasta_filter(raw, FASTA_KEEP)
            rec = FASTARecord(
                defline=defline, sequence=filtered.tobytes().decode("latin-1")
            )
            rec._seq_bytes = filtered  # device-path fast access; str kept for API
            records.append(rec)

        for line in data.split(b"\n"):
            s = line.strip()
            if not s:
                continue
            if s.startswith(b">"):
                flush()
                defline = s.decode("latin-1")
                parts = []
            else:
                parts.append(s)
        flush()

        logger.info(
            f"Loaded {len(records)} sequences in {time.time() - start_time:.2f} seconds"
        )
        return records


def record_seq_bytes(record: FASTARecord) -> np.ndarray:
    """uint8 view of a record's sequence (cached by the loader when possible)."""
    cached = getattr(record, "_seq_bytes", None)
    if cached is not None and len(cached) == len(record.sequence):
        return cached
    return np.frombuffer(
        record.sequence.encode("latin-1", errors="replace"), dtype=np.uint8
    )


def record_packed(record: FASTARecord):
    """(packed_nibbles | None) for a record, cached on the instance.

    Returns None when the sequence contains bytes outside the 16-letter
    FASTA alphabet (engine then uses the exact byte pipeline). The packed
    array holds the record's 4-bit codes two-per-byte starting at an even
    position boundary (one trailing pad nibble for odd lengths).
    """
    from ..native import nibble_pack
    from ..ops.encoding import NIB_LUT

    seq = record_seq_bytes(record)
    cached = getattr(record, "_packed_cache", None)
    if cached is not None and cached[0] == len(seq):
        return cached[1]
    packed = nibble_pack(seq, NIB_LUT)
    record._packed_cache = (len(seq), packed)
    return packed
