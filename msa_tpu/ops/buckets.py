"""Shape bucketing: bound recompilation under XLA's static-shape model.

The reference's workloads mix wildly different lengths (big13: 30k..90k;
xulin.dat: 5..70000 — SURVEY.md §2.3). XLA compiles one program per shape, so
sequences are padded up to a small set of bucket lengths; the DP cost model
(padded m*n) then drives the static LPT schedule, exactly the cost model the
reference validated in its static-LPT variants (``testing8/test.cpp:107-113``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from msa_tpu.config import DEFAULT

X_SENTINEL = -1
Y_SENTINEL = -2


def bucket_length(n: int, quantum: int = DEFAULT.bucket_quantum) -> int:
    """Round up to the bucket grid: quantum granularity, power-of-two-ish.

    Uses 2 significant bits (1.0x/1.25x/1.5x/1.75x powers of two) so padding
    waste is <= 25% while keeping the number of distinct shapes tiny.
    """
    n = max(n, 1)
    q = -(-n // quantum) * quantum
    if q <= quantum:
        return quantum
    # round q up to a 2-significant-bit number
    bits = q.bit_length()
    step = 1 << max(bits - 3, 0)
    return -(-q // step) * step


def encode_padded(seq: str, length: int, sentinel: int) -> np.ndarray:
    """Character codes as int32, padded to ``length`` with ``sentinel``."""
    codes = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8).astype(
        np.int32
    )
    if len(codes) > length:
        raise ValueError("sequence longer than bucket")
    return np.concatenate(
        [codes, np.full(length - len(codes), sentinel, dtype=np.int32)]
    )


def group_by_bucket(
    lengths: Sequence[Tuple[int, int]],
    quantum: int = DEFAULT.bucket_quantum,
) -> Dict[Tuple[int, int], List[int]]:
    """Map (bucket_m, bucket_n) -> list of task indices."""
    groups: Dict[Tuple[int, int], List[int]] = {}
    for idx, (m, n) in enumerate(lengths):
        key = (bucket_length(m, quantum), bucket_length(n, quantum))
        groups.setdefault(key, []).append(idx)
    return groups
