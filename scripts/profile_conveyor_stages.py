"""Clean-process stage timing of align_pairs_conveyor on big13.

Instruments the production entry point by monkeypatching sync points
around the segmented fill and the walk-scan dispatches (np.asarray
fetches — the only real sync on this platform). Records per-segment fill
completion, when each walk scan chunk was DISPATCHED relative to the
fill (the overlap the segmentation buys), and the decode tail. Run
twice; the second line is the warm number.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401

import numpy as np

from msa_tpu.utils.msaio import parse_file
from msa_tpu.utils.tasks import pair_task_list


def main():
    problem = parse_file("/root/repo/data/mseq-big13-example.txt")
    genes = problem.genes
    tasks = pair_task_list(len(genes))
    pairs = [(t.i, t.j) for t in tasks]
    cells = sum(len(genes[i]) * len(genes[j]) for i, j in pairs)

    import msa_tpu.ops.conveyor as conv

    orig_seg = conv._conveyor_fill_segment
    orig_scan = conv._conveyor_walk_scan
    marks = {"seg_done": [], "walk_dispatch": [], "walk_fetched": []}

    def seg_wrap(*a, **kw):
        out = orig_seg(*a, **kw)
        np.asarray(out[0])  # sync: per-segment scores fetch
        marks["seg_done"].append(time.time())
        return out

    def scan_wrap(*a, **kw):
        marks["walk_dispatch"].append(time.time())
        return orig_scan(*a, **kw)

    conv._conveyor_fill_segment = seg_wrap
    conv._conveyor_walk_scan = scan_wrap

    for rep in range(2):
        for k in marks:
            marks[k] = []
        t0 = time.time()
        conv.align_pairs_conveyor(genes, pairs, problem.pxy, problem.pgap)
        total = time.time() - t0
        segs = [round(t - t0, 3) for t in marks["seg_done"]]
        wd = [round(t - t0, 3) for t in marks["walk_dispatch"]]
        print(
            f"rep{rep}: seg_done={segs} walk_dispatch_at={wd} "
            f"total={total:.3f}s = {cells/total/1e9:.1f} GCUPS"
        )
    print(
        "NOTE: seg_wrap's per-segment sync serializes fill segments — the "
        "production path does not sync there; use bench.py for the true "
        "e2e number. This profile shows the fill/walk interleaving shape."
    )


if __name__ == "__main__":
    main()
