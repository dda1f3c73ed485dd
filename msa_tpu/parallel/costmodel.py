"""Cost models for pair scheduling.

The reference tried three generations of cost model (SURVEY.md §2.2): the
analytic ``cost = m*n`` (``testing8``), a hard-coded table of measured
microseconds (``testing11/test.cpp:150-267``), and a fitted linear model
(``testing11/p1.cpp:186``). The analytic model is exact for DP *cells*, but
wall-clock per pair also carries per-pair fixed overhead (dispatch, padding
ramp) — this module provides both, plus on-device calibration that replaces
testing11's hard-coded table with measured throughput.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional, Sequence, Tuple


@dataclasses.dataclass
class CalibratedCost:
    """cost_us(m, n) = fixed_us + m*n / gcups / 1e3."""

    gcups: float = 60.0  # measured fill throughput per chip
    fixed_us: float = 120_000.0  # per-pair dispatch + ramp overhead

    def cost_us(self, m: int, n: int) -> float:
        return self.fixed_us + m * n / self.gcups / 1e3


def analytic_cost(m: int, n: int) -> int:
    """The reference's exact cell-count model (testing8)."""
    return m * n


def calibrate(
    sample_len: int = 20000, reps: int = 2
) -> Optional[CalibratedCost]:
    """Measure fill throughput on the local device (None off-accelerator)."""
    import jax

    if jax.default_backend() == "cpu":
        return None
    import numpy as np

    from msa_tpu.ops.pallas_nw import nw_score_pallas

    rng = np.random.default_rng(0)
    x = "".join(rng.choice(list("ACGT"), sample_len))
    y = "".join(rng.choice(list("ACGT"), sample_len))
    nw_score_pallas(x, y, 3, 2)  # compile
    t0 = time.time()
    nw_score_pallas(x, y, 3, 2)
    fixed_probe = time.time() - t0
    best = fixed_probe
    for _ in range(reps - 1):
        t0 = time.time()
        nw_score_pallas(x, y, 3, 2)
        best = min(best, time.time() - t0)
    gcups = sample_len * sample_len / best / 1e9
    return CalibratedCost(gcups=max(gcups, 1.0))
