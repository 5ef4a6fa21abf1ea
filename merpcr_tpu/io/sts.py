"""STS file loading + searchable-entry construction.

Replicates every loader quirk of the reference (``engine.py:193-329``), which
is the single source of truth for hit-list equality:

* skip blank lines and '#' comments; line numbers count ALL lines
  (engine.py:216-222)
* a non-comment line with < 4 tab-separated fields fails the WHOLE load
  (engine.py:225-230)
* primers uppercased (engine.py:233-234)
* PCR size: "a-b" -> (a+b)//2; non-positive or unparsable -> default -Z size
  (engine.py:304-322)
* primer shorter than wordsize -> STS dropped entirely (engine.py:241-243)
* len(p1)+len(p2) > pcr_size -> size clamped UP, counted (engine.py:245-247)
* TWO entries per line: forward '+' (primer1, primer2 as written) and
  reverse '-' (primer1 = primer2 as written, primer2 = revcomp(original
  primer1)) — the reference never reverse-complements primer2 for the
  forward record (engine.py:253-281); this "as-written" orientation is part
  of the output contract.
* each entry is keyed by the FIRST ambiguity-free W-mer of its primer1;
  primers with no valid W-mer are dropped per-direction and counted
  (engine.py:264-281, 331-355)

The result keeps both the user-facing ``STSRecord`` list (insertion order ==
the reference's ``sts_records``) and NumPy struct-of-arrays columns that the
table compiler (``merpcr_tpu.ops.table``) turns into device arrays.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass, field
from typing import List

import numpy as np

from ..models import STSRecord
from ..ops.encoding import (
    decode_bytes,
    encode_bytes,
    hash_value_bytes,
    reverse_complement_bytes,
)

logger = logging.getLogger(__name__)


@dataclass
class STSLoadResult:
    """Parsed STS set: user-facing records + SoA columns for table building."""

    ok: bool = False
    records: List[STSRecord] = field(default_factory=list)
    # Per searchable entry (same order as `records`):
    hashes: np.ndarray = None  # int64[E]  first-valid W-mer hash of entry primer1
    hash_offsets: np.ndarray = None  # int32[E]
    p1_lens: np.ndarray = None  # int32[E]
    p2_lens: np.ndarray = None  # int32[E]
    pcr_sizes: np.ndarray = None  # int32[E]
    p1_list: List[np.ndarray] = field(default_factory=list)  # uint8 arrays
    p2_list: List[np.ndarray] = field(default_factory=list)
    max_pcr_size: int = 0
    bad_primers_short: int = 0
    bad_primers_ambig: int = 0
    bad_pcr_size: int = 0


def _parse_pcr_size(pcr_size_str: str, default_pcr_size: int) -> int:
    """Reference engine.py:304-322."""
    if "-" in pcr_size_str:
        try:
            size_range = pcr_size_str.split("-")
            if len(size_range) == 2 and size_range[0] and size_range[1]:
                low = int(size_range[0])
                high = int(size_range[1])
                return (low + high) // 2
            return default_pcr_size
        except ValueError:
            return default_pcr_size
    try:
        pcr_size = int(pcr_size_str)
        return pcr_size if pcr_size > 0 else default_pcr_size
    except ValueError:
        return default_pcr_size


class STSLoader:
    """Parses an STS file into searchable entries (reference engine.py:193-302)."""

    @staticmethod
    def load_file(filename: str, wordsize: int, default_pcr_size: int) -> STSLoadResult:
        start_time = time.time()
        res = STSLoadResult()

        file_size = os.path.getsize(filename)
        if file_size == 0:
            logger.error(f"STS file '{filename}' is empty")
            return res

        logger.info(f"Reading STS file: {filename}")

        hashes: list[int] = []
        hoffs: list[int] = []
        p1l: list[int] = []
        p2l: list[int] = []
        sizes: list[int] = []

        def insert(record: STSRecord, p1b: np.ndarray, p2b: np.ndarray,
                   hash_offset: int, hash_value: int):
            res.records.append(record)
            res.p1_list.append(p1b)
            res.p2_list.append(p2b)
            hashes.append(hash_value)
            hoffs.append(hash_offset)
            p1l.append(len(p1b))
            p2l.append(len(p2b))
            sizes.append(record.pcr_size)

        with open(filename, "r") as fh:
            line_no = 0
            for line in fh:
                line_no += 1
                line = line.strip()
                if not line or line.startswith("#"):
                    continue

                fields = line.split("\t")
                if len(fields) < 4:
                    logger.error(
                        f"Bad STS file format at line {line_no}. Expected at least 4 fields."
                    )
                    return STSLoadResult()  # whole load fails (engine.py:225-230)

                sts_id = fields[0]
                primer1 = fields[1].upper()
                primer2 = fields[2].upper()
                pcr_size = _parse_pcr_size(fields[3], default_pcr_size)
                alias = fields[4] if len(fields) > 4 else ""

                if len(primer1) < wordsize or len(primer2) < wordsize:
                    res.bad_primers_short += 1
                    continue

                if len(primer1) + len(primer2) > pcr_size:
                    res.bad_pcr_size += 1
                    pcr_size = len(primer1) + len(primer2)

                if pcr_size > res.max_pcr_size:
                    res.max_pcr_size = pcr_size

                p1b = encode_bytes(primer1)
                p2b = encode_bytes(primer2)

                # Forward entry: primer1/primer2 as written (engine.py:264-270)
                off1, h1 = hash_value_bytes(p1b, wordsize)
                if off1 >= 0:
                    insert(
                        STSRecord(
                            id=sts_id, primer1=primer1, primer2=primer2,
                            pcr_size=pcr_size, alias=alias, offset=line_no,
                            hash_offset=off1, direct="+",
                        ),
                        p1b, p2b, off1, h1,
                    )
                else:
                    res.bad_primers_ambig += 1

                # Reverse entry: primer1 = primer2 as written,
                # primer2 = revcomp(original primer1) (engine.py:272-281)
                rc1 = reverse_complement_bytes(p1b)
                off2, h2 = hash_value_bytes(p2b, wordsize)
                if off2 >= 0:
                    insert(
                        STSRecord(
                            id=sts_id, primer1=primer2,
                            primer2=decode_bytes(rc1),
                            pcr_size=pcr_size, alias=alias, offset=line_no,
                            hash_offset=off2, direct="-",
                        ),
                        p2b, rc1, off2, h2,
                    )
                else:
                    res.bad_primers_ambig += 1

        if res.bad_primers_short > 0:
            logger.warning(
                f"{res.bad_primers_short} STSs have primer shorter than word size "
                f"({wordsize}): not included in search"
            )
        if res.bad_primers_ambig > 0:
            logger.warning(
                f"{res.bad_primers_ambig} primers have ambiguities which prevent "
                f"computation of a hash value: not included in search"
            )
        if res.bad_pcr_size > 0:
            logger.warning(
                f"{res.bad_pcr_size} STSs have a primer length sum greater than "
                f"the pcr size: expected pcr size adjusted"
            )

        res.hashes = np.asarray(hashes, dtype=np.int64)
        res.hash_offsets = np.asarray(hoffs, dtype=np.int32)
        res.p1_lens = np.asarray(p1l, dtype=np.int32)
        res.p2_lens = np.asarray(p2l, dtype=np.int32)
        res.pcr_sizes = np.asarray(sizes, dtype=np.int32)
        res.ok = True

        logger.info(
            f"Loaded {len(res.records)} STS records in "
            f"{time.time() - start_time:.2f} seconds"
        )
        return res
