"""Mesh scaling curve: pairs/s and schedule balance from 1 to N devices.

Measures (a) the sharded all-pairs score engine's throughput on virtual CPU
meshes of growing size and (b) the LPT-vs-block schedule imbalance on a
pod-scale synthetic workload — the analog of the reference's node-count
sweep (``testing15/run.slurm``; its 4/8/12-node walltimes are BASELINE.md's
scaling rows). Run on CPU (virtual devices):

    JAX_PLATFORMS=cpu python scripts/scaling_curve.py --devices 8 --k 64

Results append to scaling_curve.jsonl.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--k", type=int, default=32)
    # Pair sizes large enough that compute dominates dispatch; note that
    # virtual CPU devices SHARE physical cores, so the curve demonstrates
    # sharding correctness + bounded collective overhead, not real speedup
    # (only real chips can show that — BASELINE.md's 4/8/12-node rows).
    ap.add_argument("--min-len", type=int, default=512)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--pod-k", type=int, default=256, help="schedule-only k")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--e2e-devices", default="",
        help="comma list of local-device counts for the e2e pipeline "
        "section (subprocess per count; e.g. 1,2,4)",
    )
    ap.add_argument("--out", default="scaling_curve.jsonl")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import numpy as np

    from msa_tpu.parallel.engine import sharded_pair_scores
    from msa_tpu.parallel.mesh import get_mesh
    from msa_tpu.parallel.schedule import pair_costs, schedule_for
    from msa_tpu.utils.tasks import num_pairs

    rng = np.random.default_rng(1)
    genes = [
        "".join(rng.choice(list("ACGT"), rng.integers(args.min_len,
                                                      args.max_len)))
        for _ in range(args.k)
    ]
    total = num_pairs(args.k)
    cells = sum(
        len(genes[i]) * len(genes[j])
        for i in range(1, args.k)
        for j in range(i)
    )
    records = []

    # (a) measured cells/s on growing meshes (compute sharded over devices).
    # Cells/s is the right scaling proxy: pairs/s on tiny pairs measures
    # dispatch latency, not compute (the r2 curve's mistake). Efficiency is
    # (cells/s at N) / (N * cells/s at 1).
    base_rate = None
    for nd in [d for d in (1, 2, 4, 8, 16) if d <= args.devices]:
        mesh = get_mesh(nd)
        sharded_pair_scores(genes, 3, 2, mesh=mesh)  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            np.asarray(sharded_pair_scores(genes, 3, 2, mesh=mesh))
            best = min(best, time.time() - t0)
        rate = cells / best
        if base_rate is None:
            base_rate = rate
        rec = {
            "metric": "sharded_scores",
            "devices": nd,
            "pairs": total,
            "cells": cells,
            "walltime_s": round(best, 4),
            "mcells_per_s": round(rate / 1e6, 2),
            "scaling_efficiency": round(rate / (nd * base_rate), 4),
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)

    # (c) e2e alignment-pipeline throughput, LPT-sharded over local devices
    # (models/kway._run_batched): one process, growing device count, every
    # pair through the interpret-mode device pipeline. Virtual CPU devices
    # SHARE physical cores (this host: 2), so this measures sharding
    # correctness + per-device dispatch overhead, not chip speedup — the
    # per-device pipelines are fully independent (no collectives), so on
    # real chips the axis scales like the reference's pair-distribution.
    if args.e2e_devices:
        import os
        import subprocess
        for nd in [int(d) for d in args.e2e_devices.split(",")]:
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={nd}"
            env.update({
                "MSA_TPU_INTERPRET": "1",
                "MSA_TPU_SMALL_THRESHOLD": "0",
                "MSA_TPU_SNAP_K": "128",
                "MSA_TPU_RB_ALIGN": "128",
                "MSA_TPU_RB_CONVEYOR": "128",
                "MSA_TPU_MAX_SEQ_LEN": "512",
                "MSA_TPU_LOCAL_DEVICES": str(nd),
            })
            code = (
                "import sys, time, json; sys.path.insert(0, '/root/repo');\n"
                "from msa_tpu.models.kway import align_kway\n"
                "from msa_tpu.utils.msaio import parse_file\n"
                "p = parse_file('/root/repo/data/mseq1.dat')\n"
                "align_kway(p, backend='pallas')  # compile\n"
                "t0 = time.time()\n"
                "r = align_kway(p, backend='pallas')\n"
                "dt = time.time() - t0\n"
                "print(json.dumps({'dt': dt, 'hash': r.chain_hash[:16]}))\n"
            )
            out = subprocess.run(
                [sys.executable, "-c", code], env=env,
                capture_output=True, text=True, timeout=1800,
            )
            last = out.stdout.strip().splitlines()[-1] if out.stdout else "{}"
            try:
                r = json.loads(last)
            except json.JSONDecodeError:
                r = {"error": out.stderr[-400:]}
            rec = {
                "metric": "e2e_local_devices",
                "devices": nd,
                "pairs": 36,
                "walltime_s": round(r.get("dt", 0.0), 3),
                "hash_ok": r.get("hash") == "4d676f40ea4c1e6b",
            }
            if "error" in r:
                rec["error"] = r["error"]
            records.append(rec)
            print(json.dumps(rec), flush=True)

    # (b) schedule balance at pod scale (pure host math; k=256 -> 32640
    # pairs): max/mean shard load for LPT vs block, 1..N shards.
    rng = np.random.default_rng(2)
    pod_lens = np.exp(rng.uniform(np.log(1000), np.log(30000),
                                  size=args.pod_k)).astype(int)
    pod_genes = ["A" * int(n) for n in pod_lens]
    costs = {t.task_id: c for t, c in pair_costs(pod_genes)}
    for nd in (2, 4, 8, 16, 32):
        for policy in ("lpt", "block"):
            shards = schedule_for(pod_genes, nd, policy=policy)
            loads = [sum(costs[t.task_id] for t in s) for s in shards]
            rec = {
                "metric": "schedule_balance",
                "policy": policy,
                "shards": nd,
                "pod_k": args.pod_k,
                "imbalance": round(max(loads) / (sum(loads) / nd), 4),
            }
            records.append(rec)
            print(json.dumps(rec), flush=True)

    with open(args.out, "a") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
