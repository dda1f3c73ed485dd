"""Pallas traceback for big pairs: segment recompute + in-kernel walk.

The reference reconstructs alignments by walking a fully materialized DP
matrix (``seqalign-mpi-skeleton.cpp:236-262``) — up to 30 GB for 100k-scale
pairs, which no TPU HBM layout should replicate. Here the fill kernel
(``pallas_nw``) snapshots its diagonal wavefront state every ``K`` steps;
this module's walk kernel then re-derives, for each K-step *segment* along
the traceback path, a narrow windowed band of the DP (width ``W = K + 384``
lanes below the walk position — forward recompute contaminates lanes upward
from the window base at one lane per step, and the path descends at most one
lane per step, so the window stays exact on every cell the walk touches),
packs the segment's move matrix 2 bits per cell along the step axis, DMAs it
to SMEM, and walks it in-kernel with scalar loads only, emitting the
reference's exact tie-break moves (match -> diag -> up -> left).

One launch per pair covers all bands: the grid iterates (band, segment) in
descending diagonal order; the walk position is carried across grid steps in
SMEM scratch (the TPU grid is sequential). Segments the path does not touch
are predicated off. Memory: O(v_len) per snapshot in HBM, O(K*W) VMEM.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msa_tpu.ops.buckets import X_SENTINEL, Y_SENTINEL

LANES = 128
K = 512  # snapshot stride (diagonal steps per segment)
KC = K // LANES
# Recompute window width in lanes (multiple of 128). The walk enters a
# segment at lane q_e and can descend at most K lanes in K diagonal steps;
# contamination climbs from the window base at one lane per step, so cell
# (t, q) is exact iff q >= w0 + t. With w0 <= q_e - K - safety the deepest
# path cell (q_e - K + t at step t... >= q_e - K) stays >= w0 + t for every
# t, so W = K + safety + alignment slack covers the path exactly: the walk
# visits lanes [q_e - K, q_e]; with w0 = align128(q_e - K - 128) the top
# lane q_e sits at most K + 255 above w0 < W = K + 384.
W_MAX = K + 384
NEG_FILL = 2**30


def _shift_insert_1d(v, elem_vec, lane0_mask):
    """(1, W) flat shift by one lane, inserting elem_vec's lane 0 at lane 0."""
    rolled = pltpu.roll(v, shift=1, axis=1)
    return jnp.where(lane0_mask, elem_vec, rolled)


@functools.partial(
    jax.jit,
    static_argnames=("num_bands", "s_max", "rb", "v_len", "interpret"),
)
def _walk_call(
    snaps: jnp.ndarray,  # (num_bands*s_max*3, 1, v_len) int32 flat snapshots
    rows_all: jnp.ndarray,  # (num_bands, 1, Yp) int32; [b] = dp[b*rb][j] @ j-1
    xshift: jnp.ndarray,  # (1, Xp) int32; xshift[t] = x[t-1]
    yfw: jnp.ndarray,  # (1, P1 + Ypad) int32; yfw[P1 + t] = y[t]
    yrev: jnp.ndarray,  # (1, *) int32; yrev[P1 + P0 + n - 1 - t] = y[t]
    params: jnp.ndarray,  # (8,) int32: m, n, pxy, pgap, yoff, p1, 0, 0
    *,
    num_bands: int,
    s_max: int,
    rb: int,
    v_len: int,
    interpret: bool = False,
):
    G = num_bands * s_max
    W = min(W_MAX, v_len)  # whole state fits -> window is exact (w0 = 0)

    def kernel(
        params_ref, snaps_ref, rows_ref, xs_ref, yfw_ref, yrev_ref,
        moves_ref, meta_ref,
        st, seeds, xw, yd0, yseg, tseg, pdirs, sdirs, sem,
    ):
        g = pl.program_id(0)
        m = params_ref[0]
        n = params_ref[1]
        pxy = params_ref[2]
        pgap = params_ref[3]
        yoff = params_ref[4]  # P1 + P0 + n
        p1 = params_ref[5]  # static lead pad of yfw

        b = num_bands - 1 - g // s_max
        s = (s_max - 1) - g % s_max
        dl0 = s * K
        i0 = b * rb

        lane0_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) == 0
        flat_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        flat_k = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        @pl.when(g == 0)
        def _():
            st[0] = m
            st[1] = n
            st[2] = 0  # done flag

        i_cur = st[0]
        j_cur = st[1]
        done = st[2]
        q_cur = i_cur - i0
        dl_cur = q_cur + j_cur
        active = (
            (done == 0)
            & (q_cur >= 1)
            & (q_cur <= rb)
            & (dl_cur > dl0)
        )

        # Per-segment metadata (SMEM scalars): move count, end i, end j.
        meta_ref[0, 0, 0] = 0
        meta_ref[0, 0, 1] = i_cur
        meta_ref[0, 0, 2] = j_cur

        @pl.when(active)
        def _():
            w0 = jnp.clip(
                ((q_cur - K - 128) // LANES) * LANES, 0, v_len - W
            )

            # --- DMA seeds and feeds ---
            # All sliced leading dims ride axis 0 (untiled); the trailing
            # (1, len) blocks are full/128-aligned, as Mosaic DMA requires.
            sbase = (b * s_max + s) * 3
            cps = [
                pltpu.make_async_copy(
                    snaps_ref.at[pl.ds(sbase + r, 1), :, pl.ds(pl.multiple_of(w0, LANES), W)],
                    seeds.at[pl.ds(r, 1)],
                    sem.at[r],
                )
                for r in range(3)
            ]
            cp_x = pltpu.make_async_copy(
                xs_ref.at[0:1, :, pl.ds(pl.multiple_of(i0 + w0, LANES), W)], xw, sem.at[3]
            )
            cp_y0 = pltpu.make_async_copy(
                yrev_ref.at[0:1, :, pl.ds(pl.multiple_of(yoff - dl0 + w0, LANES), W)], yd0, sem.at[4]
            )
            cp_yf = pltpu.make_async_copy(
                yfw_ref.at[0:1, :, pl.ds(pl.multiple_of(p1 + dl0 - w0, LANES), K)], yseg, sem.at[5]
            )
            cp_t = pltpu.make_async_copy(
                rows_ref.at[pl.ds(b, 1), :, pl.ds(pl.multiple_of(dl0, LANES), K)], tseg, sem.at[6]
            )
            for cp in cps + [cp_x, cp_y0, cp_yf, cp_t]:
                cp.start()
            for cp in cps + [cp_x, cp_y0, cp_yf, cp_t]:
                cp.wait()

            xv = xw[0, 0:1, :]
            w0_is_0 = w0 == 0
            top_inject_mask = lane0_w & w0_is_0

            # --- recompute K steps, windowed; dirs packed 2-bit along t ---
            # Moves are 2 bits, and packing them along the *step* axis is
            # pure elementwise work (shift-or into an accumulator flushed
            # every 16 steps) — no cross-lane compaction. The packed block
            # then DMAs to SMEM so the walk below is scalar loads only.
            def chunk_body(c, carry):
                prev1, prev1s, prev2s, ydv = carry
                cbase = pl.multiple_of(c * LANES, LANES)
                ywin = yseg[0, 0:1, pl.ds(cbase, LANES)]
                twin = tseg[0, 0:1, pl.ds(cbase, LANES)]
                # widen chunks to W lanes so lane-0 selects broadcast right
                # (jnp.where needs shapes to broadcast: (1,128) vs (1,W) do
                # not; pad by static slice into a (1, W) zero canvas)

                def step(si, icarry):
                    prev1, prev1s, prev2s, ydv, ywin, twin, acc = icarry
                    t = cbase + si + 1
                    dl = dl0 + t

                    ydv = jnp.where(
                        lane0_w,
                        jax.lax.broadcast_in_dim(
                            ywin[0:1, 0:1], (1, W), (0, 1)
                        ),
                        pltpu.roll(ydv, shift=1, axis=1),
                    )
                    match = xv == ydv
                    sub = jnp.where(match, 0, pxy)
                    t1 = prev2s + sub
                    t2 = jnp.minimum(prev1, prev1s) + pgap
                    cur = jnp.minimum(t1, t2)
                    cur = jnp.where(
                        top_inject_mask,
                        jax.lax.broadcast_in_dim(
                            twin[0:1, 0:1], (1, W), (0, 1)
                        ),
                        cur,
                    )
                    cur = jnp.where(
                        flat_w == dl - w0, (i0 + dl) * pgap, cur
                    )

                    dirs_v = jnp.where(
                        match,
                        0,
                        jnp.where(
                            prev2s + pxy == cur,
                            1,
                            jnp.where(prev1s + pgap == cur, 2, 3),
                        ),
                    )
                    # Pack step t-1 at bits 2*((t-1)%16); multiply by a
                    # scalar power of two (vector<<scalar is the same op).
                    sub16 = (t - 1) % 16
                    acc = acc | dirs_v * (1 << (2 * sub16))

                    @pl.when(sub16 == 15)
                    def _():
                        pdirs[pl.ds((t - 1) // 16, 1), :] = acc

                    acc = jnp.where(sub16 == 15, 0, acc)

                    ywin = pltpu.roll(ywin, shift=LANES - 1, axis=1)
                    twin = pltpu.roll(twin, shift=LANES - 1, axis=1)
                    prev1s_new = jnp.where(
                        lane0_w, NEG_FILL, pltpu.roll(cur, shift=1, axis=1)
                    )
                    return (cur, prev1s_new, prev1s, ydv, ywin, twin, acc)

                # Rolled loop (unroll=1): the walk kernel is latency-bound
                # on tiny (1, W) vectors, and a full unroll here multiplies
                # compile time ~30x for no measurable runtime win.
                acc0 = jnp.zeros((1, W), jnp.int32)
                prev1, prev1s, prev2s, ydv, _, _, _ = jax.lax.fori_loop(
                    0, LANES, step,
                    (prev1, prev1s, prev2s, ydv, ywin, twin, acc0),
                )
                return (prev1, prev1s, prev2s, ydv)

            jax.lax.fori_loop(
                0, KC, chunk_body,
                (
                    seeds[0, 0:1, :],
                    seeds[1, 0:1, :],
                    seeds[2, 0:1, :],
                    yd0[0, 0:1, :],
                ),
            )

            cp_d = pltpu.make_async_copy(pdirs, sdirs, sem.at[7])
            cp_d.start()
            cp_d.wait()

            # --- walk the segment ---
            # With the packed dirs in SMEM, each move is a scalar load plus
            # a shift/mask — no vector loads, reductions, or vector->scalar
            # syncs on the serial per-move critical path.
            def w_cond(stt):
                i, j, cnt = stt
                q = i - i0
                return (q >= 1) & (i > 0) & (j > 0) & (q + j > dl0)

            def w_body(stt):
                i, j, cnt = stt
                q = i - i0
                dl = q + j
                t = dl - dl0 - 1
                word = sdirs[t // 16, q - w0]
                mv = (word >> (2 * (t % 16))) & 3
                moves_ref[0, 0, cnt] = mv
                step_i = jnp.where(mv <= 2, 1, 0)
                step_j = jnp.where(mv == 2, 0, 1)
                return (i - step_i, j - step_j, cnt + 1)

            i_f, j_f, cnt_f = jax.lax.while_loop(
                w_cond, w_body, (i_cur, j_cur, 0)
            )

            meta_ref[0, 0, 0] = cnt_f
            meta_ref[0, 0, 1] = i_f
            meta_ref[0, 0, 2] = j_f
            st[0] = i_f
            st[1] = j_f
            st[2] = jnp.where((i_f == 0) | (j_f == 0), 1, 0)

    moves, meta = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(memory_space=pltpu.ANY),  # snaps
            pl.BlockSpec(memory_space=pltpu.ANY),  # rows_all
            pl.BlockSpec(memory_space=pltpu.ANY),  # xshift
            pl.BlockSpec(memory_space=pltpu.ANY),  # yfw
            pl.BlockSpec(memory_space=pltpu.ANY),  # yrev
        ],
        out_specs=(
            # Moves land in SMEM: the walk emits one scalar per move, so a
            # scalar store beats vector-register staging + 128-lane flushes.
            pl.BlockSpec(
                (1, 1, K), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 8), lambda g: (g, 0, 0), memory_space=pltpu.SMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, 1, K), jnp.int32),
            jax.ShapeDtypeStruct((G, 1, 8), jnp.int32),  # (count, end i/j)
        ),
        scratch_shapes=[
            pltpu.SMEM((8,), jnp.int32),  # walk state across grid steps
            pltpu.VMEM((3, 1, W), jnp.int32),  # seeds
            pltpu.VMEM((1, 1, W), jnp.int32),  # x window
            pltpu.VMEM((1, 1, W), jnp.int32),  # yd init window
            pltpu.VMEM((1, 1, K), jnp.int32),  # y forward feed
            pltpu.VMEM((1, 1, K), jnp.int32),  # top row feed
            pltpu.VMEM((K // 16, W), jnp.int32),  # packed segment dirs
            pltpu.SMEM((K // 16, W), jnp.int32),  # packed dirs, walk copy
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(params, snaps, rows_all, xshift, yfw, yrev)
    return moves, meta


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


RB_ALIGN = 32640  # v_len = 32768 -> R = 256 (multiple of 128: aligned
                  # snapshot slices). Band-ramp padding costs m*rb extra
                  # cells per pair, so smaller bands make the *fill* faster —
                  # but they grow the walk grid (bands x segments) and its
                  # per-segment overhead faster: rb=16256 measured 39.7 GCUPS
                  # e2e vs 43.4 at rb=32640 on big13. Walk cost rules here.
Y_CAP = 100352  # spec max sequence length (~100k, docs/Project2B.pdf p.5)
X_CAP = 100352  # band-grid cap: ceil(X_CAP/RB_ALIGN) = 4 bands compiled
SMALL_THRESHOLD = 1 << 21  # below this m*n, the jnp full-dirs path wins


def nw_align_pallas(
    x: str, y: str, pxy: int, pgap: int, interpret: bool = False
) -> Tuple[int, str, str]:
    """Penalty + byte-exact alignment via Pallas fill + traceback walk."""
    from msa_tpu.utils.alignment import moves_to_alignment

    m, n = len(x), len(y)
    if m == 0 or n == 0 or m * n <= SMALL_THRESHOLD:
        from msa_tpu.ops.nw_jax import nw_align_jax

        return nw_align_jax(x, y, pxy, pgap)

    from msa_tpu.ops.pallas_nw import (
        SNAP_K,
        _band_geometry,
        _band_sweep_call,
        build_fill_inputs,
    )

    y_cap = max(Y_CAP, _round_up(n, 8 * LANES))
    rb, v_len, real_nb, q_last, Yp = _band_geometry(
        m, n, RB_ALIGN, y_cap=y_cap, align_mode=True
    )
    # Compile one kernel per bucket: the band grid is sized for the cap and
    # bands beyond the pair's real count are runtime-skipped.
    num_bands = max(real_nb, -(-max(m, X_CAP) // rb))
    s_max = (rb + Yp) // SNAP_K + 1
    P1 = rb
    P0 = (-n) % LANES
    Xp = _round_up(num_bands * rb + v_len + LANES, LANES)
    yfw_len = _round_up(P1 + s_max * K + 2 * K, LANES)
    yrev_len = _round_up(P1 + LANES + y_cap + v_len + 2 * LANES, LANES)

    # Host -> device traffic is the bottleneck in this environment: upload
    # only the raw int8 code buffers; every kernel input is derived on
    # device (build_fill_inputs / _build_walk_inputs).
    xshift8 = np.full(Xp, X_SENTINEL, np.int8)
    xshift8[1 : 1 + m] = np.frombuffer(x.encode("latin-1"), dtype=np.uint8)
    ypad8 = np.full(max(Yp, y_cap), Y_SENTINEL, np.int8)
    ypad8[:n] = np.frombuffer(y.encode("latin-1"), dtype=np.uint8)
    xshift8 = jnp.asarray(xshift8)
    ypad8 = jnp.asarray(ypad8)

    xbands, ybuf = build_fill_inputs(
        xshift8, ypad8[:Yp], num_bands=num_bands, rb=rb, v_len=v_len
    )
    params_fill = np.array(
        [m, n, pxy, pgap, q_last, real_nb, 0, 0], dtype=np.int32
    )
    score, rows, snaps = _band_sweep_call(
        xbands, ybuf, jnp.asarray(params_fill),
        num_bands=num_bands, rb=rb, v_len=v_len,
        emit_rows=True, emit_snaps=True, interpret=interpret,
        snap_k=SNAP_K,
    )
    score = score[0, 0]

    # rows_all[b] = dp[b*rb][j] at index j-1: analytic row 0, then the fill's
    # emitted band-bottom rows shifted down by one band.
    jj = jnp.arange(Yp, dtype=jnp.int32)
    analytic = ((jj + 1) * pgap)[None, :].astype(jnp.int32)
    if num_bands > 1:
        rows_all = jnp.concatenate(
            [analytic, rows[: num_bands - 1, 0, :]], axis=0
        )
    else:
        rows_all = analytic
    rows_all = rows_all.reshape(num_bands, 1, Yp)
    snaps_flat = snaps.reshape(num_bands * s_max * 3, 1, v_len)

    xs32, yfw, yrev = _build_walk_inputs(
        xshift8, ypad8, P1 + P0 + n - y_cap,
        p1=P1, yfw_len=yfw_len, yrev_len=yrev_len, y_cap=y_cap,
    )
    params = np.array(
        [m, n, pxy, pgap, P1 + P0 + n, P1, 0, 0], dtype=np.int32
    )

    moves, meta = _walk_call(
        snaps_flat,
        rows_all,
        xs32,
        yfw,
        yrev,
        jnp.asarray(params),
        num_bands=num_bands,
        s_max=s_max,
        rb=rb,
        v_len=v_len,
        interpret=interpret,
    )
    l_max = _round_up(num_bands * rb + y_cap + 2 * K, LANES)
    compact, total = _compact_moves(moves, meta, l_max=l_max)
    compact_np = np.asarray(compact)
    all_moves = compact_np[: int(total)].tolist()
    a1, a2 = moves_to_alignment(x, y, all_moves)
    return int(score), a1, a2


@functools.partial(
    jax.jit,
    static_argnames=("p1", "yfw_len", "yrev_len", "y_cap"),
)
def _build_walk_inputs(xshift8, ypad8, rev_shift, *, p1, yfw_len, yrev_len,
                       y_cap):
    """Device-side construction of the walk kernel's feed buffers."""
    xs = xshift8.astype(jnp.int32)[None, None, :]
    ybase = ypad8[:y_cap].astype(jnp.int32)
    yfw = jnp.full((yfw_len,), Y_SENTINEL, jnp.int32)
    yfw = jax.lax.dynamic_update_slice(yfw, ybase, (p1,))
    zrev = jnp.flip(ybase)  # y data lands at [y_cap-n, y_cap)
    yrev = jnp.full((yrev_len,), Y_SENTINEL, jnp.int32)
    yrev = jax.lax.dynamic_update_slice(yrev, zrev, (0,))
    # Move the reversed data to [p1+P0, p1+P0+n): shift by p1+P0+n-y_cap.
    # Wrapped elements are sentinels (the data region never wraps).
    yrev = jnp.roll(yrev, rev_shift)
    return xs, yfw[None, None, :], yrev[None, None, :]


@functools.partial(jax.jit, static_argnames=("l_max",))
def _compact_moves(moves, meta, *, l_max):
    """Concatenate per-segment move rows on device -> (l_max,) int8 + total.

    Keeps the bulky (G, K) walk output on device; only the compacted
    byte stream crosses the device->host link.
    """
    moves = moves[:, 0, :]
    cnts = meta[:, 0, 0]
    offs = jnp.cumsum(cnts) - cnts
    tt = jnp.arange(moves.shape[1], dtype=jnp.int32)[None, :]
    mask = tt < cnts[:, None]
    flat_idx = jnp.where(mask, offs[:, None] + tt, l_max)
    compact = (
        jnp.zeros((l_max + 1,), jnp.int8)
        .at[flat_idx.reshape(-1)]
        .set(moves.reshape(-1).astype(jnp.int8), mode="drop")
    )
    return compact[:l_max], jnp.sum(cnts)
