"""Decompose the conveyor's post-fill time: walk device / fetch / decode.

Fills big13 once (single-segment sweep), then times each walk scan chunk
dispatch-to-fetch on the warm device, and the host decode separately.
This is the measurement behind the round-5 walk work (docs/PERF.md).
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

    # Intercept the walk-scan and decode layers inside the production
    # driver on its SECOND (warm) call.
    orig_scan = conv._conveyor_walk_scan
    timings = {"scan": [], "fetch": [], "decode": 0.0}
    capture = {"on": False}

    def scan_wrap(*a, **kw):
        if not capture["on"]:
            return orig_scan(*a, **kw)
        t0 = time.time()
        moves_s, meta_s = orig_scan(*a, **kw)
        np.asarray(meta_s[0, 0, 0, 0])  # device sync via tiny fetch
        t1 = time.time()
        w = np.asarray(moves_s)
        m = np.asarray(meta_s)
        t2 = time.time()
        timings["scan"].append(round(t1 - t0, 3))
        timings["fetch"].append(round(t2 - t1, 3))
        return w, m  # numpy arrays: later np.asarray is free

    conv._conveyor_walk_scan = scan_wrap

    conv.align_pairs_conveyor(genes, pairs, problem.pxy, problem.pgap)
    capture["on"] = True
    t0 = time.time()
    out = conv.align_pairs_conveyor(genes, pairs, problem.pxy, problem.pgap)
    total = time.time() - t0
    cells = sum(len(genes[i]) * len(genes[j]) for i, j in pairs)
    print(f"warm e2e total {total:.3f}s = {cells/total/1e9:.1f} GCUPS")
    print(
        f"walk chunks: scan(dev)={timings['scan']} sum="
        f"{sum(timings['scan']):.3f}s; fetch={timings['fetch']} sum="
        f"{sum(timings['fetch']):.3f}s"
    )
    print(
        "NOTE: scan times include any fill segments still queued ahead "
        "of the walk dispatch on the device stream; the LAST chunks are "
        "the clean walk-only numbers."
    )


if __name__ == "__main__":
    main()
