"""Synthetic workload generator (pod-scale inputs in the reference format).

The reference shipped fixed datasets (k <= 13, SURVEY.md §2.3); a pod-scale
deployment needs workloads with hundreds of sequences. Emits the exact
stdin format the CLI consumes (pxy pgap k + k sequence lines,
``submit/xuliny-seqalkway.cpp:44-48``), with controllable length
distribution so both balanced and adversarially skewed (xulin.dat-style)
workloads can be produced deterministically.

    python scripts/gen_workload.py --k 256 --min-len 1000 --max-len 30000 \
        --dist loguniform --seed 7 > pod256.dat
"""

import argparse
import sys

import numpy as np

ALPHA = np.frombuffer(b"ACGT", dtype=np.uint8)


def gen_lengths(rng, k, lo, hi, dist):
    if dist == "uniform":
        return rng.integers(lo, hi + 1, size=k)
    if dist == "loguniform":
        return np.exp(
            rng.uniform(np.log(lo), np.log(hi + 1), size=k)
        ).astype(np.int64)
    if dist == "skew":
        # xulin.dat-style adversarial mix: mostly tiny, a few huge.
        lens = rng.integers(lo, max(lo + 1, hi // 100), size=k)
        big = rng.choice(k, size=max(1, k // 16), replace=False)
        lens[big] = rng.integers(hi // 2, hi + 1, size=big.size)
        return lens
    raise ValueError(f"unknown dist {dist!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--min-len", type=int, default=1000)
    ap.add_argument("--max-len", type=int, default=30000)
    ap.add_argument(
        "--dist", default="loguniform",
        choices=["uniform", "loguniform", "skew"],
    )
    ap.add_argument("--pxy", type=int, default=3)
    ap.add_argument("--pgap", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    lens = gen_lengths(rng, args.k, args.min_len, args.max_len, args.dist)
    w = sys.stdout
    w.write(f"{args.pxy}\n{args.pgap}\n{args.k}\n")
    for n in lens:
        codes = ALPHA[rng.integers(0, 4, size=int(n))]
        w.write(codes.tobytes().decode("ascii"))
        w.write("\n")


if __name__ == "__main__":
    main()
