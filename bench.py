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

# Full golden output recorded by the reference
# (testing15/12node-16-cpt-1-npn-snowy.out:2-3): the ENTIRE 128-hex chain
# hash and all 78 penalties gate the timing, not just a prefix.
GOLDEN_HASH = "c0befee8737ac74a1ece5abae5cca722c2eaf2bf028aaca8f3f6607204b7e68ea0707a881d5512a723439ab67007e5301a9c126272a3ff2ad96923b0dcf27dab"
GOLDEN_PENALTIES = [int(v) for v in """31202 48016 25007 56880 53193 37279 52116 30000 32754 48092 60756 61018 60977 48923 33238 66240 50320 59270 40544 49432 35042 78083 68543 50000 49163 48080 20000 44441 86911 70000 67514 57881 40000 46264 26560 27675 95621 87344 76149 60000 62871 53120 38797 41672 27581 104197 94673 80000 75191 65682 56240 51869 42800 40810 29031 112962 100000 90000 83981 74245 64669 54941 45332 35586 33228 33143 120000 110000 102209 92694 80000 75951 60000 57329 40000 38890 30859 15323 """.split()]
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

    # Warmup passes: the first populates the compile cache and loads the
    # programs into the remote backend; the second absorbs the remaining
    # per-process warm-in (the first timed rep otherwise runs ~10-20%
    # slow on this platform). Also the correctness gate — the hash must
    # match the reference's golden output.
    result = align_kway(problem, backend="pallas")
    align_kway(problem, backend="pallas")
    if result.chain_hash != GOLDEN_HASH or result.penalties != GOLDEN_PENALTIES:
        print(
            json.dumps(
                {
                    "metric": "big13_e2e_gcups",
                    "value": 0.0,
                    "unit": "GCUPS",
                    "vs_baseline": 0.0,
                    "error": "hash/penalties mismatch vs golden",
                }
            )
        )
        return 1

    # 5 timed reps (best + full spread reported) — the reference's own
    # methodology ran each config 3 times and kept the best
    # (testing15/*snowy{,1,2}.out); the axon pool here drifts several
    # percent between moments, so a couple more reps make the best-rep
    # estimate stabler. Every rep is hash-gated, not just the warmup.
    times = []
    for _ in range(5):
        t0 = time.time()
        result = align_kway(problem, backend="pallas")
        times.append(time.time() - t0)
        assert result.chain_hash == GOLDEN_HASH

    gcups = cells / min(times) / 1e9
    print(
        json.dumps(
            {
                "metric": "big13_e2e_gcups",
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
                "reps": [round(cells / t / 1e9, 2) for t in times],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
