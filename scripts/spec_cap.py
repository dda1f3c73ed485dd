"""Spec-cap proof: one ~100,352-length pair end-to-end on the chip.

The reference was designed around the assignment's ~100k length cap
(``docs/Project2B.pdf`` p.5 — a 90k x 85k int32 matrix riding the 32 GB
node budget). The TPU framework's geometry supports the cap
(``config.max_seq_len = 100_352``, 4-band walk grid) but round 2 never ran
a cap-scale pair end-to-end. This script aligns one m = max_seq_len pair on
the device (both fill modes) and cross-checks penalty AND alignment strings
against the memory-bounded blocked host oracle
(``ops/reference.nw_align_numpy_blocked``). Appends a JSON record to
artifacts/spec_cap_r4.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401

import numpy as np


def main():
    import pickle
    import os

    from msa_tpu.config import DEFAULT
    from msa_tpu.ops.reference import nw_align_numpy_blocked

    m = DEFAULT.max_seq_len  # 100,352
    n = 100_000
    rng = np.random.default_rng(2026)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    x = alpha[rng.integers(0, 4, size=m)].tobytes().decode("ascii")
    y = alpha[rng.integers(0, 4, size=n)].tobytes().decode("ascii")
    cells = m * n
    print(f"pair: {m} x {n} = {cells:.3e} cells", flush=True)

    # The blocked host oracle costs ~16 min per orientation; cache its
    # (deterministic) outputs so device-side reruns are cheap.
    cache = f"/root/repo/artifacts/spec_cap_host_{m}x{n}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            host, host_rev, t_host = pickle.load(f)
        print(f"host oracle (cached): score={host[0]}", flush=True)
    else:
        t0 = time.time()
        host = nw_align_numpy_blocked(x, y, 3, 2)
        t_host = time.time() - t0
        print(
            f"host blocked oracle: {t_host:.1f}s score={host[0]}",
            flush=True,
        )
        host_rev = nw_align_numpy_blocked(y, x, 3, 2)
        with open(cache, "wb") as f:
            pickle.dump((host, host_rev, t_host), f)

    results = {"m": m, "n": n, "cells": cells,
               "host_s": round(t_host, 1), "score": host[0]}
    genes = [x, y]
    pairs = [(0, 1), (1, 0)]  # both orientations exercise m>n and n>m
    # Device: banded per-pair path (nw_align_pallas) — the single-pair
    # production route for a k=2 problem.
    from msa_tpu.ops.pallas_walk import nw_align_pallas

    nw_align_pallas(x, y, 3, 2)  # compile
    t0 = time.time()
    dev = nw_align_pallas(x, y, 3, 2)
    t_dev = time.time() - t0
    ok_banded = dev == host
    print(
        f"banded device: {t_dev:.2f}s = {cells/t_dev/1e9:.1f} GCUPS "
        f"{'MATCH' if ok_banded else 'MISMATCH'}",
        flush=True,
    )
    results["banded_s"] = round(t_dev, 3)
    results["banded_gcups"] = round(cells / t_dev / 1e9, 1)
    results["banded_exact"] = bool(ok_banded)

    # Conveyor path needs >= 2 pairs; run both orientations in one sweep.
    # r4 reported ONE cold number (31.6 s) that conflated Mosaic compile
    # with run — time a cold and a warm pass separately so the routing
    # decision (models/kway.choose_fill_mode) rests on the warm number.
    from msa_tpu.ops.conveyor import align_pairs_conveyor

    t0 = time.time()
    got = align_pairs_conveyor(genes, pairs, 3, 2)
    t_cold = time.time() - t0
    t0 = time.time()
    got2 = align_pairs_conveyor(genes, pairs, 3, 2)
    t_warm = time.time() - t0
    ok_conv = (
        got[0] == host and got[1] == host_rev
        and got2[0] == host and got2[1] == host_rev
    )
    print(
        f"conveyor device (2 pairs): cold {t_cold:.2f}s, warm "
        f"{t_warm:.2f}s = {2*cells/t_warm/1e9:.1f} GCUPS "
        f"{'MATCH' if ok_conv else 'MISMATCH'}",
        flush=True,
    )
    results["conveyor_2pair_cold_s"] = round(t_cold, 3)
    results["conveyor_2pair_warm_s"] = round(t_warm, 3)
    results["conveyor_warm_gcups"] = round(2 * cells / t_warm / 1e9, 1)
    results["conveyor_exact"] = bool(ok_conv)

    with open("/root/repo/artifacts/spec_cap_r5.json", "w") as f:
        json.dump(results, f, indent=1)
    print("PASS" if ok_banded and ok_conv else "FAIL", flush=True)
    return 0 if ok_banded and ok_conv else 1


if __name__ == "__main__":
    raise SystemExit(main())
