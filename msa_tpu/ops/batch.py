"""Batched pair pipeline: the whole all-pairs workload in one device call.

The reference amortized nothing — every pair was a fresh MPI task with its
own messages (``submit/xuliny-seqalkway.cpp:305-331``). Here all big pairs
share one compiled program (band grid sized for the length cap, inactive
bands runtime-skipped), so the entire workload runs as a single jit call:
the gene table is uploaded once as int8 codes, a ``lax.scan`` walks the pair
list on device, and the traceback moves come back as one 2-bit-packed byte
stream. Host<->device traffic is O(sum of sequence lengths), not
O(pairs x buffers).

Pairs are processed in groups of ``P_GROUP``: each group runs P fills
back-to-back (the fill saturates the VPU on its own), then ONE walk launch
that traces all P pairs concurrently in the sublane dimension — the walk is
a latency-bound chain of small-vector ops, so P pairs cost barely more than
one (see ``pallas_walk``). Groups are formed from pairs sorted by m+n so
walks in a group finish together.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.config import DEFAULT
from msa_tpu.ops.buckets import X_SENTINEL, Y_SENTINEL
from msa_tpu.ops.pallas_nw import (
    SNAP_K,
    _band_geometry,
    _band_sweep_call,
    build_fill_inputs,
)
from msa_tpu.ops.pallas_walk import (
    K,
    LANES,
    RB_ALIGN,
    X_CAP,
    Y_CAP,
    _build_walk_inputs,
    _round_up,
    _walk_call,
    decode_moves,
    walk_slot_budget,
)
from msa_tpu.utils.alignment import moves_to_alignment

P_GROUP = DEFAULT.p_group  # pairs per walk launch (see config)


def _static_geometry():
    """The one shared geometry for every capped pair (see pallas_walk)."""
    rb, v_len, _, _, Yp = _band_geometry(
        X_CAP, Y_CAP, RB_ALIGN, y_cap=Y_CAP, align_mode=True
    )
    num_bands = -(-X_CAP // rb)
    s_max = (rb + Yp) // SNAP_K + 1
    P1 = rb
    Xp = _round_up(num_bands * rb + v_len + LANES, LANES)
    yfw_len = _round_up(P1 + s_max * K + 2 * K, LANES)
    yrev_len = _round_up(P1 + LANES + Y_CAP + v_len + 2 * LANES, LANES)
    return rb, v_len, num_bands, s_max, Yp, P1, Xp, yfw_len, yrev_len


@functools.partial(jax.jit, static_argnames=("interpret",))
def _align_group_device(gene_table, group_params, *, interpret=False):
    """One group on device: P fills (lax.scan), then one P-wide walk.

    Groups are dispatched from the host one call at a time (all enqueued
    asynchronously), so the host's move decode of group g overlaps the
    device executing groups g+1.. — the reference kept ranks busy the same
    way by replenishing tasks as results arrived
    (``submit/xuliny-seqalkway.cpp:305-331``).

    gene_table: (k, Xp) int8, row g = gene codes in shifted layout
                (table[g, t] = code(gene[t-1]), sentinel elsewhere).
    group_params: (P_GROUP, 32) int32 rows:
        [0:8]  fill params  (m, n, pxy, pgap, q_last, real_nb, 0, 0)
        [8:24] walk params  (m, n, pxy, pgap, yoff, p1, 0, 0, snap-base
               table [16:20], row-slot table [20:24] — see _walk_call)
        [24]   x gene index, [25] y gene index, [26] rev_shift
    """
    (rb, v_len, num_bands, s_max, Yp, P1, Xp, yfw_len,
     yrev_len) = _static_geometry()
    S3 = num_bands * s_max * 3
    g8 = walk_slot_budget(X_CAP + Y_CAP, num_bands)

    def fill_one(carry, pp):
        params_fill = pp[0:8]
        xi = pp[24]
        yi = pp[25]
        rev_shift = pp[26]
        pgap = pp[3]

        xshift8 = jax.lax.dynamic_index_in_dim(
            gene_table, xi, keepdims=False
        )
        ypad_len = max(Yp, Y_CAP)
        ypad8 = jax.lax.dynamic_slice(
            jax.lax.dynamic_index_in_dim(gene_table, yi, keepdims=False),
            (1,),
            (ypad_len,),
        )

        xbands, ybuf = build_fill_inputs(
            xshift8, ypad8[:Yp], num_bands=num_bands, rb=rb, v_len=v_len
        )
        score, rows, snaps = _band_sweep_call(
            xbands, ybuf, params_fill,
            num_bands=num_bands, rb=rb, v_len=v_len,
            emit_rows=True, emit_snaps=True, snap_k=SNAP_K,
            interpret=interpret, unroll=1 if interpret else 128,
        )

        jj = jnp.arange(Yp, dtype=jnp.int32)
        analytic = ((jj + 1) * pgap)[None, :].astype(jnp.int32)
        rows_all = jnp.concatenate(
            [analytic, rows[: num_bands - 1, 0, :]], axis=0
        ).reshape(num_bands, 1, Yp)
        snaps_flat = snaps.reshape(S3, 1, v_len)

        xs32, yfw, yrev = _build_walk_inputs(
            xshift8, ypad8, rev_shift,
            p1=P1, yfw_len=yfw_len, yrev_len=yrev_len, y_cap=Y_CAP,
        )
        return carry, (
            score[0, 0], rows_all, snaps_flat,
            xs32[0], yfw[0], yrev[0], pp[8:24],
        )

    _, (scores, rows_s, snaps_s, xs_s, yfw_s, yrev_s, wparams) = (
        jax.lax.scan(fill_one, None, group_params)
    )
    moves, meta = _walk_call(
        snaps_s.reshape(P_GROUP * S3, 1, v_len),
        rows_s.reshape(P_GROUP * num_bands, 1, Yp),
        xs_s,
        yfw_s,
        yrev_s,
        wparams,
        p_group=P_GROUP,
        g8=g8,
        num_bands=num_bands,

        rb=rb,
        v_len=v_len,
        interpret=interpret,
    )
    # moves: (g8, P, K//16) int32, 16 moves per word, packed in-kernel
    # by the walk (decode_moves on host); counts ride meta[:, :, 0].
    return scores, moves, meta[:, :, 0]


def align_pairs_batched(
    genes: Sequence[str],
    pairs: Sequence[Tuple[int, int]],  # (i, j) gene indices per pair
    pxy: int,
    pgap: int,
    interpret: bool = False,
    on_result=None,
) -> List[Tuple[int, str, str]]:
    """Align many (big) pairs in one device call; returns per-pair results.

    Every sequence must fit the cap (X_CAP). Pairs are sorted by descending
    m+n (walk length), grouped P_GROUP at a time, and the group count padded
    with the cheapest pair; results return in the caller's order.
    ``on_result(idx, (penalty, a1, a2))`` fires as each pair's walk decodes
    (incremental journaling: a crash mid-workload preserves finished pairs).
    """
    (rb, v_len, num_bands, s_max, Yp, P1, Xp, yfw_len,
     yrev_len) = _static_geometry()

    k = len(genes)
    table = np.full((k, Xp), X_SENTINEL, np.int8)
    for g, seq in enumerate(genes):
        if len(seq) > X_CAP:
            raise ValueError(f"sequence {g} exceeds cap {X_CAP}")
        codes = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
        table[g, 1 : 1 + len(codes)] = codes
    # ypad slices read table[yi, 1 : 1+max(Yp, Y_CAP)]: rows must be long
    # enough and y-padding must read as Y_SENTINEL, not X_SENTINEL.
    ypad_len = max(Yp, Y_CAP)
    if Xp < 1 + ypad_len:
        raise AssertionError("gene table narrower than ypad window")
    for g, seq in enumerate(genes):
        table[g, 1 + len(seq) :] = Y_SENTINEL

    num = len(pairs)
    # Sort by walk length so the pairs sharing a walk launch finish their
    # walks together (a group's slot count is its slowest member's).
    order = sorted(
        range(num),
        key=lambda idx: -(len(genes[pairs[idx][0]]) + len(genes[pairs[idx][1]])),
    )
    p_pad = -(-num // P_GROUP) * P_GROUP
    # Pad the batch with the cheapest pair, not pairs[0] (which for sorted
    # workloads is often the most expensive one).
    pad_pair = min(pairs, key=lambda ij: len(genes[ij[0]]) * len(genes[ij[1]]))
    rows = np.zeros((p_pad, 32), dtype=np.int32)
    for slot in range(p_pad):
        i, j = pairs[order[slot]] if slot < num else pad_pair
        m, n = len(genes[i]), len(genes[j])
        real_nb = max(1, -(-m // rb))
        q_last = m - (real_nb - 1) * rb
        P0 = (-n) % LANES
        p_in_group = slot % P_GROUP
        rows[slot, 0:8] = [m, n, pxy, pgap, q_last, real_nb, 0, 0]
        rows[slot, 8:16] = [m, n, pxy, pgap, P1 + P0 + n, P1, 0, 0]
        for b in range(min(num_bands, 4)):
            # per-group snaps stacking: pair p's band b segment s sits at
            # snaps row 3*((p*nb + b)*s_max + s)
            rows[slot, 16 + b] = (p_in_group * num_bands + b) * s_max
            rows[slot, 20 + b] = p_in_group * num_bands + b
        rows[slot, 24] = i
        rows[slot, 25] = j
        rows[slot, 26] = P1 + P0 + n - Y_CAP

    n_groups = p_pad // P_GROUP
    table_dev = jnp.asarray(table)
    gpp = jnp.asarray(rows).reshape(n_groups, P_GROUP, 32)
    # Enqueue every group's program up front (JAX dispatch is async): the
    # device streams group after group while the host decodes finished ones.
    futs = [
        _align_group_device(table_dev, gpp[g], interpret=interpret)
        for g in range(n_groups)
    ]

    out: List[Tuple[int, str, str]] = [None] * num  # type: ignore[list-item]
    for g, (scores_d, words_d, counts_d) in enumerate(futs):
        scores = np.asarray(scores_d)  # blocks until group g completes
        words = np.asarray(words_d)  # (g8, P_GROUP, K//16)
        counts = np.asarray(counts_d)  # (g8, P_GROUP)
        for p in range(P_GROUP):
            slot = g * P_GROUP + p
            if slot >= num:
                break
            idx = order[slot]
            moves = decode_moves(words[:, p, :], counts[:, p])
            i, j = pairs[idx]
            a1, a2 = moves_to_alignment(genes[i], genes[j], moves)
            out[idx] = (int(scores[p]), a1, a2)
            if on_result is not None:
                on_result(idx, out[idx])
    return out
