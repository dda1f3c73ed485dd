"""Deterministic static LPT pair scheduling.

Replaces the reference's dynamic MPI master–worker queue
(``submit/xuliny-seqalkway.cpp:272-361``) with the scheme the reference
itself proved out in its static-LPT variant (``testing8/test.cpp:212-251``):
the DP cost model ``cost = m*n`` is *exact* (the fill is data-independent),
so every participant derives the same assignment locally from broadcast
metadata — no dispatcher, no point-to-point protocol, no
MPI_THREAD_MULTIPLE analog. This is the natural SPMD design: the schedule
is a pure function of the sequence lengths.
"""

from __future__ import annotations

import heapq
from typing import List, Sequence, Tuple

from msa_tpu.utils.tasks import PairTask, pair_task_list


def pair_costs(genes: Sequence[str]) -> List[Tuple[PairTask, int]]:
    """(task, cost) for every pair; cost = m*n (exact DP cell count)."""
    return [
        (t, len(genes[t.i]) * len(genes[t.j])) for t in pair_task_list(
            len(genes)
        )
    ]


def pair_costs_calibrated(
    genes: Sequence[str], model=None
) -> List[Tuple[PairTask, float]]:
    """(task, cost) with a measured wall-clock model (the reference's S5).

    ``testing11/test.cpp:150-267`` hard-coded a table of measured
    microseconds per (m, n); ``msa_tpu.parallel.costmodel.CalibratedCost``
    replaces the table with throughput + fixed-overhead terms, optionally
    measured on the local device (``costmodel.calibrate``). Captures what
    cost = m*n cannot: per-pair fixed overhead makes many small pairs
    costlier than their cell count suggests.
    """
    from msa_tpu.parallel.costmodel import CalibratedCost

    if model is None:
        model = CalibratedCost()
    return [
        (t, model.cost_us(len(genes[t.i]), len(genes[t.j])))
        for t in pair_task_list(len(genes))
    ]


def lpt_schedule(
    costs: Sequence[Tuple[PairTask, int]], num_shards: int
) -> List[List[PairTask]]:
    """Greedy longest-processing-time assignment, deterministic.

    Sort tasks by descending cost (ties broken by task id so every process
    computes the identical schedule), then repeatedly give the heaviest task
    to the least-loaded shard (ties by shard index).
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    order = sorted(costs, key=lambda tc: (-tc[1], tc[0].task_id))
    heap = [(0, shard) for shard in range(num_shards)]
    heapq.heapify(heap)
    shards: List[List[PairTask]] = [[] for _ in range(num_shards)]
    for task, cost in order:
        load, shard = heapq.heappop(heap)
        shards[shard].append(task)
        heapq.heappush(heap, (load + cost, shard))
    return shards


def block_schedule(
    tasks: Sequence[PairTask], num_shards: int
) -> List[List[PairTask]]:
    """The reference's first strategy (S1): contiguous task-id blocks.

    ``parallel1.cpp:185-201``: ``tasks_per_process = floor(total/size)``,
    shard r takes ids ``[tpp*r, tpp*(r+1))`` and the last shard also takes
    the remainder. Kept for parity/benchmark comparison — LPT dominates it
    on skewed workloads (the reference measured this too, §6 of SURVEY.md).
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    total = len(tasks)
    tpp = total // num_shards
    shards: List[List[PairTask]] = []
    for r in range(num_shards):
        lo = tpp * r
        hi = tpp * (r + 1) if r < num_shards - 1 else total
        shards.append(list(tasks[lo:hi]))
    return shards


def schedule_for(
    genes: Sequence[str],
    num_shards: int,
    policy: str = "lpt",
    cost_model=None,
) -> List[List[PairTask]]:
    """Deterministic pair schedule.

    policy = "lpt" (default, cost = m*n), "calibrated" (LPT over measured
    wall-clock cost — pass a ``costmodel.CalibratedCost`` for determinism
    across processes, every process must use identical parameters), or
    "block" (the reference's S1 layout).
    """
    if policy == "lpt":
        return lpt_schedule(pair_costs(genes), num_shards)
    if policy == "calibrated":
        return lpt_schedule(
            pair_costs_calibrated(genes, cost_model), num_shards
        )
    if policy == "block":
        return block_schedule(pair_task_list(len(genes)), num_shards)
    raise ValueError(f"unknown schedule policy {policy!r}")
