"""Stage-level profile of the conveyor path on big13 (one TPU chip).

Times in isolation: (1) the conveyor sweep (fill) alone, (2) the walk
launches alone (fill results cached on device), (3) the full
align_pairs_conveyor including host post. Compare against
scripts/profile_e2e.py (banded path).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.utils.msaio import parse_file
from msa_tpu.utils.tasks import pair_task_list


def main():
    problem = parse_file("/root/repo/data/mseq-big13-example.txt")
    genes = problem.genes
    tasks = pair_task_list(len(genes))
    pairs = [(t.i, t.j) for t in tasks]
    cells = sum(len(genes[i]) * len(genes[j]) for i, j in pairs)
    print(f"pairs={len(pairs)} cells={cells:.3e}")

    from msa_tpu.config import DEFAULT
    from msa_tpu.ops.buckets import X_SENTINEL, Y_SENTINEL
    from msa_tpu.ops.conveyor import (
        RB_CONV,
        _build_feeds,
        _conveyor_sweep_call,
        _group_walk_inputs,
        build_chunk_tables,
        plan_conveyor,
        _round_up,
    )
    from msa_tpu.ops.pallas_walk import (
        K,
        LANES,
        Y_CAP,
        _walk_call,
        decode_moves,
        walk_slot_budget,
    )

    P_GROUP = DEFAULT.p_group
    rb = RB_CONV
    num = len(pairs)
    order = sorted(
        range(num),
        key=lambda idx: -(len(genes[pairs[idx][0]]) + len(genes[pairs[idx][1]])),
    )
    ordered = [pairs[idx] for idx in order]
    plan = plan_conveyor(genes, ordered, rb=rb)
    v_len = plan.v_len
    tables = build_chunk_tables(plan)
    total_steps = plan.n_chunks * K
    lane_steps = total_steps * v_len
    print(
        f"n_chunks={plan.n_chunks} total_steps={total_steps:.3e} "
        f"lane_steps={lane_steps:.3e} (cells/lane_steps={cells/lane_steps:.2%})"
    )

    nb_max = 4
    y_cap = max(Y_CAP, plan.ymax)
    P1 = rb
    Xp = _round_up(nb_max * rb + v_len + LANES + 1 + y_cap, LANES)
    yfw_len = _round_up(P1 + rb + y_cap + 3 * K, LANES)
    yrev_len = _round_up(P1 + LANES + y_cap + v_len + 2 * LANES, LANES)

    k = len(genes)
    table = np.full((k, Xp), X_SENTINEL, np.int8)
    for g, seq in enumerate(genes):
        codes = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
        table[g, 1 : 1 + len(codes)] = codes
        table[g, 1 + len(seq):] = Y_SENTINEL
    table_dev = jnp.asarray(table)

    band_specs = np.array(
        [[bp.start, bp.xi, bp.yi, bp.i0] for bp in plan.bands],
        dtype=np.int32,
    )
    params = jnp.asarray(
        np.array([problem.pxy, problem.pgap, 0, 0, 0, 0, 0, 0], np.int32)
    )
    tables_d = jnp.asarray(tables)

    from msa_tpu.ops.conveyor import _build_xtiles

    def run_fill():
        specs_d = jnp.asarray(band_specs)
        y_conv = _build_feeds(
            table_dev, specs_d,
            xp=Xp, n_chunks=plan.n_chunks, rb=rb,
        )
        xtiles = _build_xtiles(table_dev, specs_d, v_len=v_len)
        scores_d, snaps, brow = _conveyor_sweep_call(
            params, tables_d, xtiles, y_conv,
            n_chunks=plan.n_chunks, rb=rb, v_len=v_len,
            ymax=plan.ymax, n_slots=plan.n_slots,
            n_pairs=_round_up(num, P_GROUP),
        )
        return scores_d, snaps, brow

    s, snaps, brow = run_fill()
    np.asarray(s)  # sync
    t0 = time.time()
    s, snaps, brow = run_fill()
    np.asarray(s)
    _ = np.asarray(snaps[0, 0, 0, 0])
    t_fill = time.time() - t0
    print(
        f"(1) conveyor fill: {t_fill:.2f}s = {cells/t_fill/1e9:.1f} GCUPS "
        f"(lane rate {lane_steps/t_fill/1e9:.0f} Glanes/s)"
    )

    snaps_flat = snaps.reshape(plan.n_chunks * 3, 1, v_len)

    by_slot = {}
    for bp in plan.bands:
        by_slot.setdefault(bp.pair_slot, []).append(bp)

    p_pad = -(-num // P_GROUP) * P_GROUP
    rows = np.zeros((p_pad, 32), dtype=np.int32)
    for slot in range(p_pad):
        pslot = slot if slot < num else num - 1
        i, j = ordered[pslot]
        m, n = len(genes[i]), len(genes[j])
        P0 = (-n) % LANES
        rows[slot, 8:16] = [m, n, problem.pxy, problem.pgap, P1 + P0 + n, P1, 0, 0]
        for bp in by_slot[pslot]:
            rows[slot, 16 + bp.band] = bp.start // K
            rows[slot, 20 + bp.band] = bp.brow_in
        rows[slot, 24] = i
        rows[slot, 25] = j
        rows[slot, 26] = P1 + P0 + n - y_cap
    gpp = jnp.asarray(rows).reshape(-1, P_GROUP, 32)
    n_groups = p_pad // P_GROUP
    g8 = walk_slot_budget(nb_max * rb + y_cap, nb_max)
    print(f"n_groups={n_groups} g8={g8}")

    def run_walks():
        futs = []
        for g in range(n_groups):
            xs_s, yfw_s, yrev_s, wparams = _group_walk_inputs(
                table_dev, gpp[g],
                p1=P1, yfw_len=yfw_len, yrev_len=yrev_len, y_cap=y_cap,
                ypad_len=y_cap,
            )
            moves, meta = _walk_call(
                snaps_flat, brow, xs_s, yfw_s, yrev_s, wparams,
                p_group=P_GROUP, g8=g8, num_bands=nb_max,
                rb=rb, v_len=v_len, rows_at_col_index=True,
            )
            futs.append((moves, meta))
        return [(np.asarray(m), np.asarray(t)) for m, t in futs]

    run_walks()
    t0 = time.time()
    outs = run_walks()
    t_walk = time.time() - t0
    print(f"(2) walks ({n_groups} groups): {t_walk:.2f}s")

    # (3) host decode of the walk outputs
    from msa_tpu.utils.alignment import moves_to_alignment

    t0 = time.time()
    for g, (words, meta) in enumerate(outs):
        for p in range(P_GROUP):
            slot = g * P_GROUP + p
            if slot >= num:
                break
            idx = order[slot]
            mv = decode_moves(words[:, p, :], meta[:, p, 0])
            i, j = pairs[idx]
            moves_to_alignment(genes[i], genes[j], mv)
    t_dec = time.time() - t0
    print(f"(3) host decode: {t_dec:.2f}s")

    # (4) full path — drop the stage buffers first (snaps is ~4.5 GB; two
    # copies OOM the 16 GB HBM)
    del snaps, snaps_flat, brow, outs
    from msa_tpu.ops.conveyor import align_pairs_conveyor

    t0 = time.time()
    align_pairs_conveyor(genes, pairs, problem.pxy, problem.pgap)
    t_full = time.time() - t0
    print(f"(4) align_pairs_conveyor: {t_full:.2f}s = "
          f"{cells/t_full/1e9:.1f} GCUPS")


if __name__ == "__main__":
    main()
