"""Isolate conveyor sweep per-step costs by editing the chunk table.

The sweep kernel branches per chunk on table columns (ramp, bot_active,
score event). Zeroing a column disables that work at runtime WITHOUT
recompiling (results become wrong — timing only). Differences between
variants attribute the per-step cost.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401

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

    from msa_tpu.config import DEFAULT
    from msa_tpu.ops.buckets import X_SENTINEL, Y_SENTINEL
    from msa_tpu.ops.conveyor import (
        RB_CONV,
        _build_feeds,
        _conveyor_sweep_call,
        build_chunk_tables,
        plan_conveyor,
        _round_up,
    )
    from msa_tpu.ops.pallas_walk import K, LANES

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
    ramp_frac = tables[:, 0].sum() / plan.n_chunks
    bot_frac = tables[:, 7].sum() / plan.n_chunks
    print(
        f"n_chunks={plan.n_chunks} ramp_frac={ramp_frac:.2%} "
        f"bot_frac={bot_frac:.2%}"
    )

    nb_max = 4
    from msa_tpu.ops.pallas_walk import Y_CAP

    y_cap = max(Y_CAP, plan.ymax)
    Xp = _round_up(nb_max * rb + v_len + LANES + 1 + y_cap, LANES)

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
    from msa_tpu.ops.conveyor import _build_xtiles

    specs_d = jnp.asarray(band_specs)
    y_conv = _build_feeds(
        table_dev, specs_d,
        xp=Xp, n_chunks=plan.n_chunks, rb=rb,
    )
    xtiles = _build_xtiles(table_dev, specs_d, v_len=plan.v_len)
    np.asarray(y_conv[0, 0])

    def run(tab, label, reps=3):
        tab_d = jnp.asarray(tab)
        # warm
        s, snaps, brow = _conveyor_sweep_call(
            params, tab_d, xtiles, y_conv,
            n_chunks=plan.n_chunks, rb=rb, v_len=v_len,
            ymax=plan.ymax, n_slots=plan.n_slots,
            n_pairs=_round_up(num, P_GROUP),
        )
        np.asarray(s)  # axon: only a D2H fetch actually syncs
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            s, snaps, brow = _conveyor_sweep_call(
                params, tab_d, xtiles, y_conv,
                n_chunks=plan.n_chunks, rb=rb, v_len=v_len,
                ymax=plan.ymax, n_slots=plan.n_slots,
                n_pairs=_round_up(num, P_GROUP),
            )
            np.asarray(s)
            np.asarray(snaps[0, 0, 0, 0])
            best = min(best, time.time() - t0)
        print(
            f"{label:28s} {best:6.2f}s  {cells/best/1e9:6.1f} GCUPS  "
            f"{lane_steps/best/1e9:5.0f} Glanes/s"
        )
        return best

    run(tables, "baseline (full)")

    t2 = tables.copy()
    t2[:, 0] = 0  # ramp off
    run(t2, "ramp off")

    t3 = tables.copy()
    t3[:, 7] = 0  # bottom flush DMA off (harvest still runs in-loop)
    run(t3, "bot flush off")

    t4 = tables.copy()
    t4[:, 8] = -1  # score events off (branch never taken)
    run(t4, "score events off")

    t5 = tables.copy()
    t5[:, 0] = 0
    t5[:, 7] = 0
    t5[:, 8] = -1
    run(t5, "all off")


if __name__ == "__main__":
    main()
