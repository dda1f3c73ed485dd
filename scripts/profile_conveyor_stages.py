"""Clean-process stage timing of align_pairs_conveyor on big13.

Instruments the production entry point by monkeypatching sync points
around the fill and walk dispatches (np.asarray fetches — the only real
sync on this platform). Run twice; the second line is the warm number.
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

    orig_fill = conv._conveyor_fill_device
    orig_walk = conv._conveyor_group_walk
    marks = {}

    def fill_wrap(*a, **kw):
        marks["host_pre"] = time.time()
        out = orig_fill(*a, **kw)
        np.asarray(out[0])
        marks["fill_done"] = time.time()
        return out

    gcount = [0]

    def walk_wrap(*a, **kw):
        out = orig_walk(*a, **kw)
        gcount[0] += 1
        if gcount[0] == 10:
            np.asarray(out[1][0, 0, 0])
            marks["walks_done"] = time.time()
        return out

    conv._conveyor_fill_device = fill_wrap
    conv._conveyor_group_walk = walk_wrap

    for rep in range(2):
        t0 = time.time()
        conv.align_pairs_conveyor(genes, pairs, problem.pxy, problem.pgap)
        total = time.time() - t0
        gcount[0] = 0
        print(
            f"rep{rep}: host_pre={marks['host_pre']-t0:.3f}s "
            f"fill={marks['fill_done']-marks['host_pre']:.3f}s "
            f"walks={marks['walks_done']-marks['fill_done']:.3f}s "
            f"post={t0+total-marks['walks_done']:.3f}s "
            f"total={total:.3f}s = {cells/total/1e9:.1f} GCUPS"
        )


if __name__ == "__main__":
    main()
