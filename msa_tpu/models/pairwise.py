"""Pairwise global alignment model.

One pair = one Needleman–Wunsch DP + traceback + trim (the reference's
``do_task``, ``submit/xuliny-seqalkway.cpp:183-227``). Backends:

- ``numpy``  — vectorized host oracle (golden reference; CI-safe).
- ``native`` — C++ host kernel via ctypes (fast CPU path), falls back to
               numpy when the shared library is unavailable.
- ``jax``    — jnp anti-diagonal sweep (runs on TPU or CPU).
- ``pallas`` — Pallas TPU wavefront kernels (the production path).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from msa_tpu.utils.hashing import pair_hash


@dataclasses.dataclass
class PairResult:
    task_id: int
    penalty: int
    align1: str
    align2: str
    problem_hash: str


_BACKENDS = ("numpy", "native", "jax", "pallas", "auto")


def align_pair(
    x: str, y: str, pxy: int, pgap: int, backend: str = "numpy"
) -> Tuple[int, str, str]:
    """Return (penalty, align1, align2) for one pair with the chosen backend."""
    if backend == "auto":
        backend = _pick_backend(len(x), len(y))
    if backend == "numpy":
        from msa_tpu.ops.reference import nw_align_numpy

        return nw_align_numpy(x, y, pxy, pgap)
    if backend == "native":
        from msa_tpu.native import nw_align_native

        return nw_align_native(x, y, pxy, pgap)
    if backend == "jax":
        from msa_tpu.ops.nw_jax import nw_align_jax

        return nw_align_jax(x, y, pxy, pgap)
    if backend == "pallas":
        from msa_tpu.config import DEFAULT

        if len(x) * len(y) < _HOST_THRESHOLD:
            # Tiny pairs never belong on the device: one dispatch costs
            # ~80 ms on this link, while the native host kernel finishes
            # in microseconds (measured: mseq1's 36 tiny pairs took
            # 2.86 s warm through per-pair jnp dispatches,
            # artifacts/warm_latency_r5.json pre-fix). Same byte-exact
            # output — all backends are golden-tested equal.
            from msa_tpu.native import nw_align_native

            return nw_align_native(x, y, pxy, pgap)
        if len(x) * len(y) < DEFAULT.small_threshold:
            # Small pairs take the jnp full-dirs device path: identical
            # alignment (tie-break tested vs the oracle), but a
            # seconds-long compile instead of the banded Pallas
            # mega-kernels, which are sized by max_seq_len and cost
            # minutes of cold compile — only worth paying for big pairs.
            # (The r3 conformance run spent 763 s on mseq.dat's three
            # 8-char pairs exactly here.)
            from msa_tpu.ops.nw_jax import nw_align_jax

            return nw_align_jax(x, y, pxy, pgap)
        from msa_tpu.ops.pallas_nw import nw_align_pallas

        return nw_align_pallas(x, y, pxy, pgap)
    raise ValueError(f"unknown backend {backend!r}; expected one of {_BACKENDS}")


# Below this many DP cells the host kernel beats ANY device dispatch
# (link latency ~tens of ms; the native fill does 262k cells in ~1 ms).
_HOST_THRESHOLD = 1 << 18


def _pick_backend(m: int, n: int) -> str:
    """Heuristic dispatch: tiny pairs stay on host, big pairs go to device."""
    import jax

    on_accel = jax.default_backend() not in ("cpu",)
    if on_accel and m * n >= _HOST_THRESHOLD:
        return "pallas"
    try:
        from msa_tpu.native import native_available

        if native_available():
            return "native"
    except Exception:
        pass
    return "numpy"


class PairwiseAligner:
    """Stateful wrapper carrying penalties + backend choice."""

    def __init__(self, pxy: int, pgap: int, backend: str = "auto"):
        self.pxy = pxy
        self.pgap = pgap
        self.backend = backend

    def align(self, x: str, y: str) -> Tuple[int, str, str]:
        return align_pair(x, y, self.pxy, self.pgap, backend=self.backend)

    def do_task(self, task_id: int, x: str, y: str) -> PairResult:
        """The reference's do_task: align + hash, result keyed by task id."""
        penalty, a1, a2 = self.align(x, y)
        return PairResult(task_id, penalty, a1, a2, pair_hash(a1, a2))
