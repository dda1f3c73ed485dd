"""k-way MSA by sum of pairwise alignments.

Replicates the reference's orchestration semantics
(``seqalign-mpi-skeleton.cpp:117-175``; distributed version
``submit/xuliny-seqalkway.cpp:232-364``): enumerate all k(k-1)/2 pairs in
canonical task order, align each pair, then fold the per-pair hashes into one
SHA-512 chain and collect penalties, both indexed by task id so the output is
independent of execution order and sharding.

The reference's dynamic MPI master-worker queue is replaced by a
deterministic schedule (``msa_tpu.parallel.schedule``): the DP cost model
cost = m*n is exact, so every participant derives the same assignment locally
— the design the reference itself validated in its ``testing8`` static-LPT
variant (``testing8/test.cpp:232-251``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from msa_tpu.models.pairwise import PairwiseAligner, PairResult
from msa_tpu.utils.hashing import chain_hashes
from msa_tpu.utils.msaio import Problem
from msa_tpu.utils.tasks import pair_task_list


def choose_fill_mode(genes: Sequence[str], batched) -> str:
    """Route the big-pair fill strategy per workload shape.

    The reference's real lesson was strategy selection by workload — its
    S1..S7 evolution picked a different schedule per node/pair shape
    (SURVEY.md §2.2). The TPU tradeoff is compile-shape reuse, not
    throughput: warm, the conveyor beats the banded path even on a
    2-giant-pair workload (0.36 s vs 2 x 0.22 s at the 100k spec cap,
    ``artifacts/spec_cap_r5.json``), but its program is shaped by the
    workload's chunk count — a never-seen shape pays a ~44 s Mosaic
    compile, which a one-shot run of a tiny workload can never amortize
    (the r4 artifact's unexplained "150x cliff" was exactly this).
    The banded path reuses the fixed production geometry with no new
    compile. Routing rule: conveyor at >= ``_CONVEYOR_MIN_PAIRS``
    eligible pairs (compile amortized / shape likely cached), banded
    below. ``config.fill_mode`` forces either.
    """
    from msa_tpu.config import DEFAULT

    if DEFAULT.fill_mode != "auto":
        return DEFAULT.fill_mode
    mode = "conveyor" if len(batched) >= _CONVEYOR_MIN_PAIRS else "banded"
    from msa_tpu.utils.logging import get_logger

    get_logger("msa_tpu.kway").info(
        "fill-mode auto: %d big pairs -> %s", len(batched), mode
    )
    return mode


# Minimum eligible big pairs for the conveyor under fill_mode="auto".
_CONVEYOR_MIN_PAIRS = 3


@dataclasses.dataclass
class KWayResult:
    chain_hash: str
    penalties: List[int]
    pair_results: Optional[List[PairResult]] = None


class KWayAligner:
    def __init__(self, pxy: int, pgap: int, backend: str = "auto"):
        self.pairwise = PairwiseAligner(pxy, pgap, backend=backend)

    def align_tasks(
        self,
        genes: Sequence[str],
        tasks: Sequence,
        checkpoint: Optional[str] = None,
    ) -> List[PairResult]:
        """Align an arbitrary task subset; results in the given task order.

        This is the per-shard work unit of the multi-host engine
        (``parallel.engine``): big pairs go through the batched device
        pipeline, the rest through the host path, journal-resumable.
        The reference analog is the worker loop that executed whatever
        tasks arrived (``submit/xuliny-seqalkway.cpp:369-417``) — here the
        shard is an input, not a message stream.
        """
        results: dict = {}

        journal = None
        if checkpoint:
            from msa_tpu.utils.checkpoint import PairJournal, problem_key

            journal = PairJournal(
                checkpoint,
                problem_key(self.pairwise.pxy, self.pairwise.pgap, genes),
            )
            done = journal.load()
            for t in tasks:
                if t.task_id in done:
                    penalty, h = done[t.task_id]
                    results[t.task_id] = PairResult(
                        t.task_id, penalty, "", "", h
                    )

        remaining = [t for t in tasks if t.task_id not in results]
        remaining = self._maybe_striped(genes, remaining, results, journal)
        batched = self._batched_tasks(genes, remaining)
        if batched:
            from msa_tpu.utils.hashing import pair_hash

            mode = choose_fill_mode(genes, batched)
            if mode == "conveyor":
                # Band-interleaved single sweep: every band of every pair
                # rides one continuous wavefront — no per-band ramp/drain
                # waste (ops/conveyor).
                from msa_tpu.ops.conveyor import align_pairs_conveyor as _impl
            else:
                from msa_tpu.ops.batch import align_pairs_batched as _impl

            on_task_result = None
            if journal is not None:
                # Journal each pair AS its walk decodes (the decode loop
                # sees results incrementally), not after the whole device
                # workload returns — a crash mid-workload preserves every
                # finished pair. Callbacks may fire from per-device
                # threads, so serialize the journal writes.
                import threading

                jlock = threading.Lock()

                def on_task_result(t, triple):
                    penalty, a1, a2 = triple
                    with jlock:
                        journal.record(t.task_id, penalty, pair_hash(a1, a2))

            triples = self._run_batched(
                genes, batched, _impl, on_task_result=on_task_result
            )
            for t, (penalty, a1, a2) in zip(batched, triples):
                results[t.task_id] = PairResult(
                    t.task_id, penalty, a1, a2, pair_hash(a1, a2)
                )

        for t in tasks:
            if t.task_id not in results:
                results[t.task_id] = self.pairwise.do_task(
                    t.task_id, genes[t.i], genes[t.j]
                )
                if journal is not None:
                    r = results[t.task_id]
                    journal.record(t.task_id, r.penalty, r.problem_hash)
        if journal is not None:
            journal.close()
        return [results[t.task_id] for t in tasks]

    def align_all(
        self,
        genes: Sequence[str],
        keep_alignments: bool = False,
        checkpoint: Optional[str] = None,
    ) -> KWayResult:
        tasks = pair_task_list(len(genes))
        results = self.align_tasks(genes, tasks, checkpoint=checkpoint)
        penalties = [r.penalty for r in results]
        chain = chain_hashes(r.problem_hash for r in results)
        return KWayResult(
            chain_hash=chain,
            penalties=penalties,
            pair_results=results if keep_alignments else None,
        )

    def _maybe_striped(self, genes, remaining, results, journal):
        """Opt-in: a lone giant pair spans ALL local devices, band-striped.

        ``config.single_pair_striped`` routes a workload whose only big
        pair cannot be pair-parallelized (nothing to shard) through
        ``ops/nw_striped`` — every device fills a row stripe, boundary
        rows stream in K-chunks (the reference's S3 scaled across chips,
        ``submit/xuliny-seqalkway.cpp:462-491``). Off by default: on a
        single-chip host the banded kernel is strictly better.
        """
        from msa_tpu.config import DEFAULT

        if not DEFAULT.single_pair_striped or self.pairwise.backend not in (
            "pallas", "auto"
        ):
            return remaining
        big = [
            t for t in remaining
            if len(genes[t.i]) * len(genes[t.j]) > DEFAULT.small_threshold
        ]
        if len(big) != 1:
            return remaining
        import jax

        if len(jax.local_devices()) < 2:
            return remaining
        from msa_tpu.ops.nw_striped import nw_align_band_striped
        from msa_tpu.parallel.mesh import get_mesh
        from msa_tpu.utils.hashing import pair_hash
        from msa_tpu.utils.logging import get_logger

        t = big[0]
        get_logger("msa_tpu.kway").info(
            "lone big pair (%d x %d): band-striped across %d devices",
            len(genes[t.i]), len(genes[t.j]), len(jax.local_devices()),
        )
        penalty, a1, a2 = nw_align_band_striped(
            genes[t.i], genes[t.j], self.pairwise.pxy, self.pairwise.pgap,
            get_mesh(), kchunk=DEFAULT.snap_k,
        )
        results[t.task_id] = PairResult(
            t.task_id, penalty, a1, a2, pair_hash(a1, a2)
        )
        if journal is not None:
            journal.record(t.task_id, penalty, pair_hash(a1, a2))
        return [r for r in remaining if r.task_id != t.task_id]

    def _run_batched(
        self, genes: Sequence[str], batched, impl, on_task_result=None
    ):
        """Run the device pipeline, sharded over the process's local devices.

        A TPU host is one process with several chips; the reference got its
        speedup by running the full per-pair task on every rank
        (``submit/xuliny-seqalkway.cpp:369-417``) — the local-device analog
        is an LPT split of the big-pair workload with the WHOLE fill+walk
        pipeline running per device (one host thread each; dispatch is
        async, so the threads keep every chip busy while the host decodes).
        Results are returned in ``batched`` order; the split is
        deterministic (LPT, ties by task id) so output never depends on
        thread timing.
        """
        from msa_tpu.config import DEFAULT

        interpret = bool(DEFAULT.interpret)
        pxy, pgap = self.pairwise.pxy, self.pairwise.pgap

        def run_on(tasks_d):
            cb = None
            if on_task_result is not None:
                def cb(idx, triple, tasks_d=tasks_d):
                    on_task_result(tasks_d[idx], triple)

            return impl(
                genes,
                [(t.i, t.j) for t in tasks_d],
                pxy,
                pgap,
                interpret=interpret,
                on_result=cb,
            )

        import jax

        devs = jax.local_devices()
        limit = DEFAULT.local_devices or len(devs)
        # Each device shard needs >= 2 pairs (the conveyor interleaves
        # bands of different pairs; a 1-pair shard wastes its ramp).
        n_used = max(1, min(len(devs), limit, len(batched) // 2))
        if n_used == 1:
            return run_on(batched)

        from concurrent.futures import ThreadPoolExecutor

        from msa_tpu.parallel.schedule import lpt_schedule

        costs = [(t, len(genes[t.i]) * len(genes[t.j])) for t in batched]
        shards = lpt_schedule(costs, n_used)

        def worker(dev, tasks_d):
            with jax.default_device(dev):
                return run_on(tasks_d)

        with ThreadPoolExecutor(max_workers=n_used) as pool:
            futs = [
                pool.submit(worker, devs[d], shard)
                for d, shard in enumerate(shards)
                if shard
            ]
            shard_lists = [s for s in shards if s]
            by_id = {}
            for tasks_d, fut in zip(shard_lists, futs):
                for t, triple in zip(tasks_d, fut.result()):
                    by_id[t.task_id] = triple
        return [by_id[t.task_id] for t in batched]

    def _batched_tasks(self, genes: Sequence[str], tasks):
        """Big pairs eligible for the one-call device pipeline."""
        from msa_tpu.config import DEFAULT

        if self.pairwise.backend not in ("pallas", "auto"):
            return []
        try:
            import jax

            if jax.default_backend() == "cpu" and not DEFAULT.interpret:
                return []
        except Exception:
            return []
        from msa_tpu.ops.pallas_walk import X_CAP

        big = [
            t
            for t in tasks
            if len(genes[t.i]) * len(genes[t.j]) > DEFAULT.small_threshold
            and len(genes[t.i]) <= X_CAP
            and len(genes[t.j]) <= X_CAP
        ]
        return big if len(big) >= 2 else []


def align_kway(
    problem: Problem,
    backend: str = "auto",
    keep_alignments: bool = False,
    checkpoint: Optional[str] = None,
) -> KWayResult:
    """One-shot driver: Problem -> (chain hash, penalties)."""
    engine = KWayAligner(problem.pxy, problem.pgap, backend=backend)
    return engine.align_all(
        problem.genes,
        keep_alignments=keep_alignments,
        checkpoint=checkpoint,
    )
