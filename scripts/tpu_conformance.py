"""Hardware conformance runner: all bundled datasets, golden-hash verified.

The TPU analog of the reference's golden-output methodology (SURVEY.md §4):
runs each dataset end-to-end on the device backend and compares the SHA-512
chain hash (and penalties where recorded) against the reference's published
outputs. Run on a machine with a TPU attached:

    python scripts/tpu_conformance.py [--backend pallas]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401

GOLDENS = {
    "data/mseq.dat": "602d0f604e8fb908",
    "data/mseq1.dat": "4d676f40ea4c1e6b",
    "data/mseq-big13-example.txt": "c0befee8737ac74a",
    "data/mseq-big13-example2.txt": "7af9b197a65577f9",
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", default="pallas")
    parser.add_argument(
        "--skip-big", action="store_true", help="only mseq/mseq1"
    )
    args = parser.parse_args()

    from msa_tpu.models.kway import align_kway
    from msa_tpu.utils.msaio import parse_file

    failures = 0
    for path, prefix in GOLDENS.items():
        if args.skip_big and "big13" in path:
            continue
        problem = parse_file(path)
        cells = sum(
            len(problem.genes[i]) * len(problem.genes[j])
            for i in range(1, problem.k)
            for j in range(i)
        )
        t0 = time.time()
        result = align_kway(problem, backend=args.backend)
        dt = time.time() - t0
        ok = result.chain_hash.startswith(prefix)
        failures += 0 if ok else 1
        print(
            f"{path}: {'PASS' if ok else 'FAIL'} "
            f"{dt:.2f}s {cells/dt/1e9:.1f} GCUPS "
            f"hash={result.chain_hash[:16]}",
            flush=True,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
