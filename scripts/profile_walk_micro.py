"""Micro-profile of the walk kernel: per-slot and per-group cost slopes.

Fills big13 once (production segmented fill, walks suppressed), then
times `_conveyor_walk_scan` dispatches directly on the resident
snaps/brow at varying (groups-per-scan, g8) shapes. The slope over g8
gives the per-slot cost; the slope over group count gives per-group
cost; the intercept is dispatch overhead.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401

import numpy as np


def main():
    import msa_tpu.ops.conveyor as conv
    from msa_tpu.utils.msaio import parse_file
    from msa_tpu.utils.tasks import pair_task_list

    problem = parse_file("/root/repo/data/mseq-big13-example.txt")
    genes = problem.genes
    pairs = [(t.i, t.j) for t in pair_task_list(len(genes))]

    # Capture the driver's device buffers + dispatch args by intercepting
    # the first walk scan, then abort the run (fill is complete by then
    # for chunk 0's pairs; we then re-fill fully via the remaining
    # segments being already dispatched asynchronously — snaps/brow are
    # the SAME donated buffers, so after the driver finishes they hold
    # the full fill).
    state = {}
    orig_scan = conv._conveyor_walk_scan

    def scan_wrap(snaps_flat, brow, gene_table, gpp_chunk, **kw):
        # Overwrite each call: snaps/brow are donated through the fill
        # segments, so only the LAST dispatch's buffers stay alive.
        state["args"] = (snaps_flat, brow, gene_table)
        state["kw"] = dict(kw)
        state.setdefault("gpps", []).append(gpp_chunk)
        return orig_scan(snaps_flat, brow, gene_table, gpp_chunk, **kw)

    conv._conveyor_walk_scan = scan_wrap
    conv.align_pairs_conveyor(genes, pairs, problem.pxy, problem.pgap)
    conv._conveyor_walk_scan = orig_scan

    snaps_flat, brow, gene_table = state["args"]
    kw = state["kw"]
    gpps = state["gpps"]
    print(
        f"captured {len(gpps)} chunks, kw g8={kw['g8']} "
        f"(per-chunk g8 varies; using chunk0 args)", flush=True
    )

    import jax.numpy as jnp

    def timed(gpp, g8, label, reps=3):
        kw2 = dict(kw)
        kw2["g8"] = g8
        moves, meta = orig_scan(snaps_flat, brow, gene_table, gpp, **kw2)
        np.asarray(meta[0, 0, 0, 0])  # warm + sync
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            moves, meta = orig_scan(
                snaps_flat, brow, gene_table, gpp, **kw2
            )
            np.asarray(meta[0, 0, 0, 0])
            best = min(best, time.time() - t0)
        slots = gpp.shape[0] * g8
        print(
            f"{label:34s} {best:6.3f}s  {slots:5d} slots  "
            f"{best/slots*1e6:6.0f} us/slot",
            flush=True,
        )
        return best

    g0 = gpps[0]  # 4 groups of the biggest pairs
    # Slope over group count at fixed g8.
    timed(g0[:1], 192, "1 group,  g8=192")
    timed(g0[:2], 192, "2 groups, g8=192")
    timed(g0, 192, "4 groups, g8=192")
    # Slope over g8 at fixed groups: budget must cover the biggest pair
    # (need 182) for correctness, but timing-only runs can go lower —
    # walks just truncate (results unused).
    timed(g0, 256, "4 groups, g8=256 (slack)")
    timed(g0, 128, "4 groups, g8=128 (truncated, timing only)")
    timed(g0, 64, "4 groups, g8=64  (truncated, timing only)")
    # A padded chunk (mostly inactive groups) isolates the inactive-slot
    # cost.
    if len(gpps) > 2:
        timed(gpps[2], 128, "last chunk (2 real + 2 pad groups)")


if __name__ == "__main__":
    main()
