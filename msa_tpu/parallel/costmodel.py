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
    sample_len: int = 20000, small_len: int = 2048, reps: int = 2
) -> Optional[CalibratedCost]:
    """Measure fill throughput AND per-pair fixed cost on the local device.

    Two timed pair sizes solve cost(m, n) = fixed_us + cells/rate for both
    terms — the fixed term is the whole advantage of the measured model over
    analytic m*n (the reference's testing11 finding: small pairs cost far
    more than their cells predict, ``testing11/test.cpp:150-267``). Returns
    None off-accelerator. ``nw_score_pallas`` returns a host int, so each
    call is synchronous (block_until_ready is unreliable on this platform).
    """
    import jax

    if jax.default_backend() == "cpu":
        return None
    import numpy as np

    from msa_tpu.ops.pallas_nw import nw_score_pallas

    rng = np.random.default_rng(0)

    def timed(n: int) -> float:
        x = "".join(rng.choice(list("ACGT"), n))
        y = "".join(rng.choice(list("ACGT"), n))
        nw_score_pallas(x, y, 3, 2)  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            nw_score_pallas(x, y, 3, 2)
            best = min(best, time.time() - t0)
        return best

    t_small = timed(small_len)
    t_big = timed(sample_len)
    if t_big <= t_small:
        # Timing noise inverted the two samples — one retry with more reps;
        # a silently exploded gcups (~4e5) would degrade every schedule
        # downstream, so a still-inverted calibration returns None and the
        # caller falls back to the analytic model.
        if reps < 8:
            return calibrate(sample_len, small_len, reps=reps * 4)
        return None
    d_cells = sample_len * sample_len - small_len * small_len
    gcups = d_cells / (t_big - t_small) / 1e9
    # Physical ceiling: the VPU bound estimate is ~200 GCUPS (docs/PERF.md);
    # anything past 1000 is a measurement artifact, not a device.
    gcups = min(max(gcups, 1.0), 1000.0)
    fixed_us = max(t_small * 1e6 - small_len * small_len / gcups / 1e3, 0.0)
    return CalibratedCost(gcups=gcups, fixed_us=fixed_us)
