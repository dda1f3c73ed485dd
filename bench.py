"""Benchmark: end-to-end mseq-big13 all-pairs alignment on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's headline benchmark — k=13, 78 pairwise NW DPs,
2.785e11 cells (BASELINE.md). Baseline: the reference's best 12-node/192-core
cluster result, 15 672 995 us => ~17.8 GCUPS aggregate
(testing15/12node-16-cpt-1-npn-snowy.out). The run is hash-verified against
the recorded golden output before timing is reported.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401  (compile cache setup)

GOLDEN_PREFIX = "c0befee8737ac74a"
BASELINE_GCUPS = 17.77  # 2.785e11 cells / 15.672995 s / 1e9


def workload_cells(genes):
    total = 0
    for i in range(1, len(genes)):
        for j in range(i):
            total += len(genes[i]) * len(genes[j])
    return total


def main():
    from msa_tpu.models.kway import align_kway
    from msa_tpu.utils.msaio import parse_file

    problem = parse_file("/root/repo/data/mseq-big13-example.txt")
    cells = workload_cells(problem.genes)

    # Warmup pass: populates the (persistent) compile cache; also the
    # correctness gate — the hash must match the reference's golden output.
    result = align_kway(problem, backend="pallas")
    if not result.chain_hash.startswith(GOLDEN_PREFIX):
        print(
            json.dumps(
                {
                    "metric": "big13_e2e_gcups",
                    "value": 0.0,
                    "unit": "GCUPS",
                    "vs_baseline": 0.0,
                    "error": "hash mismatch vs golden",
                }
            )
        )
        return 1

    t0 = time.time()
    result = align_kway(problem, backend="pallas")
    elapsed = time.time() - t0
    assert result.chain_hash.startswith(GOLDEN_PREFIX)

    gcups = cells / elapsed / 1e9
    print(
        json.dumps(
            {
                "metric": "big13_e2e_gcups",
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
