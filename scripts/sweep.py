"""Benchmark sweep: kernel/config shapes on the local device.

The TPU analog of the reference's Slurm sbatch matrix
(``testing/run.slurm:20-63``): sweeps band heights and backends over a
workload and records walltime + GCUPS per configuration as JSON lines in
``bench_sweep.jsonl`` (plot with scripts/plot_bench.py).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=90000)
    parser.add_argument("--n", type=int, default=85000)
    parser.add_argument(
        "--rbs", default="8192,16384,32768", help="comma-separated band sizes"
    )
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--out", default="bench_sweep.jsonl")
    args = parser.parse_args()

    import numpy as np

    from msa_tpu.ops.pallas_nw import nw_score_pallas

    rng = np.random.default_rng(0)
    x = "".join(rng.choice(list("ACGT"), args.m))
    y = "".join(rng.choice(list("ACGT"), args.n))

    records = []
    for rb in [int(r) for r in args.rbs.split(",")]:
        nw_score_pallas(x, y, 3, 2, rb=rb)  # compile + warm
        best = min(
            _timed(lambda: nw_score_pallas(x, y, 3, 2, rb=rb))
            for _ in range(args.reps)
        )
        rec = {
            "kernel": "band_score",
            "rb": rb,
            "m": args.m,
            "n": args.n,
            "walltime_s": round(best, 4),
            "gcups": round(args.m * args.n / best / 1e9, 2),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "a") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


if __name__ == "__main__":
    main()
