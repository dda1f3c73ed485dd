"""Alternating A/B harness for runtime-config perf experiments.

The axon TPU pool drifts several percent between processes (observed
96.9 -> 112.2 GCUPS on IDENTICAL code within one session), so
subprocess-per-config sweeps cannot resolve <5% effects. This harness
runs all configs in ONE process, alternating round-robin per rep, so
drift hits every config equally. Only runtime knobs (read from
``msa_tpu.config.DEFAULT`` at call time, e.g. p_group, walk_g8_mode,
fill_segments, walk_scan_groups, decode_workers) can be A/B'd here —
import-time geometry (snap_k, rb_conveyor) still needs subprocesses.

Usage::

    python scripts/ab_compare.py --reps 4 \
        --config 'base:' --config 'pg16:p_group=16'
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reps", type=int, default=4)
    parser.add_argument(
        "--config", action="append", required=True,
        help="name:field=value,field=value (empty fields = baseline)",
    )
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    from msa_tpu.config import DEFAULT
    from msa_tpu.models.kway import align_kway
    from msa_tpu.utils.msaio import parse_file

    problem = parse_file("/root/repo/data/mseq-big13-example.txt")
    cells = sum(
        len(problem.genes[i]) * len(problem.genes[j])
        for i in range(1, problem.k)
        for j in range(i)
    )

    configs = []
    for spec in args.config:
        name, _, body = spec.partition(":")
        fields = {}
        if body:
            for kv in body.split(","):
                k, _, v = kv.partition("=")
                cur = getattr(DEFAULT, k)  # raises on unknown field
                fields[k] = int(v) if isinstance(cur, int) else v
        configs.append((name, fields))

    baseline = {
        k: getattr(DEFAULT, k) for _, f in configs for k in f
    }
    golden = None

    def run_one(fields):
        nonlocal golden
        for k, v in fields.items():
            setattr(DEFAULT, k, v)
        try:
            t0 = time.time()
            result = align_kway(problem, backend="pallas")
            dt = time.time() - t0
        finally:
            for k in fields:
                setattr(DEFAULT, k, baseline[k])
        if golden is None:
            golden = result.chain_hash
        assert result.chain_hash == golden, "hash mismatch between configs"
        return cells / dt / 1e9

    # Warm every config (compiles all shapes), then alternate timed reps.
    for name, fields in configs:
        g = run_one(fields)
        print(f"warm {name}: {g:.1f} GCUPS", flush=True)
    results = {name: [] for name, _ in configs}
    for rep in range(args.reps):
        for name, fields in configs:
            g = run_one(fields)
            results[name].append(round(g, 2))
            print(f"rep{rep} {name}: {g:.1f}", flush=True)

    summary = {}
    for name, vals in results.items():
        sv = sorted(vals)
        summary[name] = {
            "reps": vals,
            "best": max(vals),
            "median": sv[len(sv) // 2],
        }
    line = json.dumps(summary)
    print(line, flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
