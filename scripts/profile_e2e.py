"""Stage-level profile of the big13 end-to-end run on one TPU chip.

Times, in isolation: (1) score-only fill over all pairs, (2) fill with
snapshot/row emission (the align-mode fill), (3) the full device batch
(fill + walk + compact), (4) the whole align_kway including host post.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.utils.msaio import parse_file
from msa_tpu.ops.batch import (
    _align_group_device,
    _static_geometry,
    align_pairs_batched,
)
from msa_tpu.utils.tasks import pair_task_list


def main():
    problem = parse_file("/root/repo/data/mseq-big13-example.txt")
    genes = problem.genes
    tasks = pair_task_list(len(genes))
    pairs = [(t.i, t.j) for t in tasks]
    cells = sum(len(genes[i]) * len(genes[j]) for i, j in pairs)
    print(f"pairs={len(pairs)} cells={cells:.3e}")

    from msa_tpu.ops.pallas_nw import _band_sweep_call, build_fill_inputs, SNAP_K
    from msa_tpu.ops.buckets import X_SENTINEL, Y_SENTINEL

    (rb, v_len, num_bands, s_max, Yp, P1, Xp, yfw_len,
     yrev_len) = _static_geometry()

    # --- (1) score-only fill, per pair, exact geometry per pair ---
    # (Set SKIP_SCORE_ONLY=1 to skip: the per-pair loop is the slow legacy
    # dispatch path and takes minutes cold.)
    import os

    if not os.environ.get("SKIP_SCORE_ONLY"):
        from msa_tpu.ops.pallas_nw import nw_score_pallas

        t0 = time.time()
        for i, j in pairs:
            s = nw_score_pallas(genes[i], genes[j], problem.pxy, problem.pgap)
        t_score_cold = time.time() - t0
        t0 = time.time()
        for i, j in pairs:
            s = nw_score_pallas(genes[i], genes[j], problem.pxy, problem.pgap)
        t_score = time.time() - t0
        print(f"(1) score-only fill: {t_score:.2f}s = "
              f"{cells/t_score/1e9:.1f} GCUPS (cold {t_score_cold:.2f}s)")

    # --- (2)+(3) batched align: time the device call alone ---
    table = np.full((len(genes), Xp), X_SENTINEL, np.int8)
    for g, seq in enumerate(genes):
        codes = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
        table[g, 1 : 1 + len(codes)] = codes
        table[g, 1 + len(seq):] = Y_SENTINEL
    from msa_tpu.ops.batch import P_GROUP
    from msa_tpu.ops.pallas_walk import K, LANES
    num = len(pairs)
    order = sorted(
        range(num),
        key=lambda idx: -(len(genes[pairs[idx][0]]) + len(genes[pairs[idx][1]])),
    )
    p_pad = -(-num // P_GROUP) * P_GROUP
    pad_pair = min(pairs, key=lambda ij: len(genes[ij[0]]) * len(genes[ij[1]]))
    rows = np.zeros((p_pad, 32), dtype=np.int32)
    from msa_tpu.ops.pallas_walk import Y_CAP
    for idx in range(p_pad):
        i, j = pairs[order[idx]] if idx < num else pad_pair
        m, n = len(genes[i]), len(genes[j])
        real_nb = max(1, -(-m // rb))
        q_last = m - (real_nb - 1) * rb
        P0 = (-n) % LANES
        rows[idx, 0:8] = [m, n, problem.pxy, problem.pgap, q_last, real_nb, 0, 0]
        rows[idx, 8:16] = [m, n, problem.pxy, problem.pgap, P1 + P0 + n, P1, 0, 0]
        for b in range(min(num_bands, 4)):
            rows[idx, 16 + b] = ((idx % P_GROUP) * num_bands + b) * s_max
            rows[idx, 20 + b] = (idx % P_GROUP) * num_bands + b
        rows[idx, 24] = i
        rows[idx, 25] = j
        rows[idx, 26] = P1 + P0 + n - Y_CAP

    n_groups = p_pad // P_GROUP
    tbl = jnp.asarray(table)
    rws = jnp.asarray(rows).reshape(n_groups, P_GROUP, 32)

    def run_groups():
        # np.asarray (not block_until_ready) forces the sync: on the axon
        # tunnel block_until_ready can return before execution completes.
        futs = [_align_group_device(tbl, rws[g]) for g in range(n_groups)]
        return [tuple(np.asarray(o) for o in f) for f in futs]

    run_groups()
    t0 = time.time()
    run_groups()
    t_batch = time.time() - t0
    print(f"(3) device batch (fill+walk): {t_batch:.2f}s = "
          f"{cells/t_batch/1e9:.1f} GCUPS")

    # --- (4) full align_pairs_batched including host post ---
    t0 = time.time()
    res = align_pairs_batched(genes, pairs, problem.pxy, problem.pgap)
    t_full = time.time() - t0
    print(f"(4) align_pairs_batched incl host: {t_full:.2f}s = "
          f"{cells/t_full/1e9:.1f} GCUPS")

    # --- (5) hashing cost ---
    from msa_tpu.utils.hashing import pair_hash, chain_hashes
    t0 = time.time()
    hs = [pair_hash(a1, a2) for (_, a1, a2) in res]
    chain = chain_hashes(hs)
    t_hash = time.time() - t0
    print(f"(5) hashing: {t_hash:.2f}s; chain={chain[:16]}")


if __name__ == "__main__":
    main()
