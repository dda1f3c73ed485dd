"""Conveyor fill: band-interleaved wavefront sweep with zero ramp waste.

The banded fill (``pallas_nw``) pays a full ``rb``-step ramp per band —
lanes above the advancing diagonal are dead until the band fills, and dead
again as it drains: ~44 % of all lane-steps on big13. This kernel removes
the waste *structurally*: every band of every pair rides ONE continuous
sweep, and a new band enters the lane space exactly as its predecessor
drains. The regions are comoving — a band's cells, its y characters, and
its ownership boundary all climb one lane per step together — so the only
per-step cost of multi-tenancy is the ramp-lane injection (x char + left
border) that the per-band kernel already performs during its ramp phase.

Schedule (host, ``plan_conveyor``): bands start at K-aligned global steps
with stagger >= n_prev + 1 (region separation), >= rb (at most one band
ramping), and >= rb + 2K after a same-pair predecessor (its boundary row
must be harvested and flushed to HBM before the successor's top feed reads
it). Feeds (x chars, y chars) are prebuilt on device as conveyor streams;
boundary rows flow through an HBM table (slot 0 = the analytic row
dp[0][j] = j*pgap, written by the kernel itself) in the ``index j = column
j`` layout so every producer flush and consumer read is 128-aligned.

Snapshots are taken at every global K-step boundary; band starts are
K-aligned, so one global snapshot serves every resident band's traceback
segment. The walk kernel (``pallas_walk``) consumes them through its
per-band tables (snap base = band start // K, row slot = the band's
predecessor boundary-row slot) with ``rows_at_col_index=True``.

Validity: a band's real cells depend only on its injected borders, its top
feed, and other real cells (never on the garbage another band leaves
behind) — the same structural argument that makes the per-band kernel's
ramp garbage harmless, and the reason the walk's windowed recompute stays
exact over conveyor snapshots.

Reference analog: none — the reference's wavefront (S3,
``submit/xuliny-seqalkway.cpp:462-491``) never overlapped tiles of
different pairs; this is where the TPU design overtakes it structurally.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msa_tpu.config import DEFAULT
from msa_tpu.ops.buckets import X_SENTINEL, Y_SENTINEL
from msa_tpu.ops.pallas_walk import K, LANES, NEG_FILL

RB_CONV = DEFAULT.rb_conveyor  # 31 * K when K = 1024: band height AND all
                 # band starts stay K-aligned, so chunk-static feed
                 # ownership holds.
CHUNK_PAD = 64   # n_chunks compiles round up to this granularity

assert RB_CONV % K == 0, "conveyor band height must be K-aligned"
# The walk's per-band tables hold 4 bands (params cols 8..15); the spec cap
# (max_seq_len ~ 100k, Project2B.pdf p.5) must fit that grid — catch a
# config change to rb_conveyor at import, not at 100k-pair runtime.
assert -(-DEFAULT.max_seq_len // RB_CONV) <= 4, (
    "max_seq_len requires > 4 conveyor bands; raise rb_conveyor"
)


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


@dataclasses.dataclass
class BandPlan:
    pair_slot: int  # workload pair index (order given by the caller)
    band: int  # band index within the pair
    i0: int  # first row of the band (band * rb)
    n: int  # y length of the pair
    xi: int  # gene index of x
    yi: int  # gene index of y
    start: int  # global step at which local dl = 0 (K-aligned)
    brow_out: int  # HBM row receiving this band's bottom boundary row
    brow_in: int  # HBM row feeding this band's top (0 = analytic)
    is_last: bool  # last band of its pair (emits the score event)
    q_last: int  # rows in the last band (score lane)


@dataclasses.dataclass
class ConveyorPlan:
    bands: List[BandPlan]
    n_chunks: int
    rb: int
    v_len: int
    ymax: int
    n_slots: int  # brow rows incl. analytic (0) and trash (n_slots - 1)
    # Per pair slot: first chunk index at which every snapshot / boundary
    # row / score event the pair's walk reads has been written — the fill
    # segment covering this chunk unlocks the pair's walk dispatch.
    pair_ready: List[int] = dataclasses.field(default_factory=list)


def plan_conveyor(
    genes: Sequence[str],
    pairs: Sequence[Tuple[int, int]],  # (xi, yi) per pair, x the band axis
    rb: int = RB_CONV,
) -> ConveyorPlan:
    """K-aligned band schedule for the whole workload (deterministic)."""
    v_len = _round_up(rb + 1, LANES * LANES)
    bands: List[BandPlan] = []
    prev_n = None  # y length of the previous band in conveyor order
    slot = 1  # 0 = analytic row
    max_n = 0
    ev_chunks = set()  # K-chunks already holding a score event
    for pslot, (xi, yi) in enumerate(pairs):
        m, n = len(genes[xi]), len(genes[yi])
        nb = max(1, -(-m // rb))
        assert nb <= 4, "walk per-band tables hold 4 bands"
        q_last = m - (nb - 1) * rb
        max_n = max(max_n, n)
        pred_row = 0  # analytic for the first band
        for b in range(nb):
            if bands:
                # >= prev_n + K: regions stay disjoint (lane q frees at
                # prev dl = q + n) INCLUDING the ramp's whole-chunk x-tile
                # merge, which writes a chunk's K lanes at the chunk START
                # — up to K-1 steps before each lane activates.
                # >= rb + K: at most one band ramping (the x-tile stage
                # holds one band) AND ramp chunk entries never collide.
                # Same-pair: predecessor's boundary row must be harvested
                # (rb steps) and flushed (chunk + DMA margin) first.
                stagger = max(prev_n + K, rb + K)
                if b > 0:
                    stagger = max(stagger, rb + 2 * K)
                start = _round_up(bands[-1].start + stagger, K)
            else:
                start = 0
            if b == nb - 1:
                # The chunk table holds one score event per chunk; event
                # position start + q_last + n is not monotone across pairs
                # (a short-n pair after a long-n one can land in an occupied
                # chunk), so defer the last band until its chunk is free.
                while (start + q_last + n) // K in ev_chunks:
                    start += K
                ev_chunks.add((start + q_last + n) // K)
            if bands:
                # Cross-file safety invariant: the kernel's whole-chunk
                # x-tile early write (_conveyor_kernel ramp merge) writes a
                # ramp chunk's K lanes at the chunk START — it is only
                # race-free because every lane of the previous band has
                # freed (prev dl = q + prev_n) at least K steps earlier.
                # A future stagger tweak must not weaken this.
                assert start - bands[-1].start >= prev_n + K, (
                    "conveyor stagger violates the x-tile merge invariant: "
                    f"start={start} prev_start={bands[-1].start} "
                    f"prev_n={prev_n} K={K}"
                )
            bp = BandPlan(
                pair_slot=pslot,
                band=b,
                i0=b * rb,
                n=n,
                xi=xi,
                yi=yi,
                start=start,
                brow_out=slot,
                brow_in=pred_row,
                is_last=(b == nb - 1),
                q_last=q_last,
            )
            bands.append(bp)
            pred_row = slot
            slot += 1
            prev_n = n
    last = bands[-1]
    total = last.start + rb + last.n + 2
    # Rows always multiple of 8: the chunk table is fetched in (8, 128)
    # SMEM blocks (Mosaic's minimum block tiling).
    n_chunks = _round_up(_round_up(-(-total // K), 8), CHUNK_PAD)
    ymax = _round_up(max_n + rb + 2 * K + LANES, K)
    pair_ready = [0] * len(pairs)
    for bp in bands:
        # Last chunk the band touches: its highest-dl snapshot / boundary
        # flush / score event all land by (start + rb + n) // K; +2 margin
        # for the K-deferred event chunk and the flush of the final
        # boundary segment.
        pair_ready[bp.pair_slot] = max(
            pair_ready[bp.pair_slot],
            min((bp.start + rb + bp.n) // K + 2, n_chunks),
        )
    return ConveyorPlan(
        bands=bands,
        n_chunks=n_chunks,
        rb=rb,
        v_len=v_len,
        ymax=ymax,
        n_slots=slot + 1,  # + trash row
        pair_ready=pair_ready,
    )


def build_chunk_tables(plan: ConveyorPlan) -> np.ndarray:
    """Per-chunk scalar schedule: (n_chunks, 128) int32.

    cols: 0 ramp_active, 1 ramp_start, 2 ramp_i0,
          3 top_src slot, 4 top_off (lane offset, K-aligned),
          5 bot_slot, 6 bot_off, 7 bot_active,
          8 ev_local_step (-1 = none), 9 ev_q, 10 ev_out_slot,
          11 ramp_first (1 at a band's first ramp chunk -> x-tile DMA),
          12 band index (x-tile row for ramp chunks).
    Rows are 128 wide (cols 13+ unused) so the kernel can fetch the table
    in (8, 128) SMEM blocks — Mosaic's minimum block tiling.
    """
    rb = plan.rb
    t = np.zeros((plan.n_chunks, 128), dtype=np.int32)
    t[:, 8] = -1
    trash = plan.n_slots - 1
    t[:, 5] = trash
    for bi, bp in enumerate(plan.bands):
        c0 = bp.start // K
        # Ramp (x-tile merge + left border injection): local dl in [0, rb];
        # keep the inject on through the whole ramp's chunks (extra steps
        # write pad lanes only — harmless, proven in the module docstring).
        ramp_chunks = -(-(rb + 1) // K)
        for c in range(c0, min(c0 + ramp_chunks, plan.n_chunks)):
            t[c, 0] = 1
            t[c, 1] = bp.start
            t[c, 2] = bp.i0
            t[c, 11] = 1 if c == c0 else 0
            t[c, 12] = bi
        # Top feed: this band owns lane 0 for local steps [0, n + 1]; its
        # values are brow[brow_in][t] (col t). Chunks may overlap the next
        # band's start only at the boundary chunk, where the next band's
        # entries overwrite — exactly right, ownership transfers there.
        feed_chunks = -(-(bp.n + 2) // K)
        for c in range(c0, min(c0 + feed_chunks, plan.n_chunks)):
            t[c, 3] = bp.brow_in
            t[c, 4] = (c - c0) * K
        # Bottom harvest: owner of lane rb for local dl in [rb, rb + n];
        # rb is K-aligned so ownership is chunk-constant.
        h0 = (bp.start + rb) // K
        h1 = -(-(bp.start + rb + bp.n + 1) // K)
        for c in range(h0, min(h1, plan.n_chunks)):
            t[c, 5] = bp.brow_out
            t[c, 6] = (c - h0) * K
            t[c, 7] = 1
        if bp.is_last:
            ev = bp.start + bp.q_last + bp.n
            c = ev // K
            assert t[c, 8] == -1, "two score events in one chunk"
            t[c, 8] = ev - c * K
            t[c, 9] = bp.q_last
            t[c, 10] = bp.pair_slot
    return t


@functools.partial(
    jax.jit, static_argnames=("xp", "n_chunks", "rb")
)
def _build_feeds(gene_table, band_specs, *, xp, n_chunks, rb):
    """Device-side conveyor y-char stream from the int8 gene table.

    band_specs: (NBANDS, 4) int32 rows (start, xi, yi, i0). Returns
    y_conv: (1, n_chunks*K) int32 (sentinels outside band spans). The x
    chars ride per-band column-major tiles instead (``_build_xtiles``).
    """
    total = n_chunks * K
    # Oversize by one gene-row width: the per-band updates write fixed-size
    # slices that may overhang the live region near the end of the
    # schedule; without the margin dynamic_update_slice would CLAMP the
    # start index and corrupt the stream.
    y_conv = jnp.full((total + xp,), Y_SENTINEL, jnp.int32)
    for r in range(band_specs.shape[0]):
        start = band_specs[r, 0]
        yi = band_specs[r, 2]
        # y chars: y_conv[start + t] = code(y[t - 1]) for t in [1, n].
        yrow = jax.lax.dynamic_index_in_dim(
            gene_table, yi, keepdims=False
        ).astype(jnp.int32)
        yslice = jax.lax.dynamic_slice(yrow, (0,), (xp,))
        y_conv = jax.lax.dynamic_update_slice(y_conv, yslice, (start,))
    return y_conv[None, :total]


@functools.partial(jax.jit, static_argnames=("v_len",))
def _build_xtiles(gene_table, band_specs, *, v_len):
    """Per-band x-char tiles in the sweep's column-major state layout.

    Tile row ``[r, c]`` holds code(x[i0 + q - 1]) at flat q = c*R + r —
    the exact xv state a fully-ramped band carries. The sweep DMAs one
    tile per band at its first ramp chunk and merges it into xv one
    K-lane range per ramp chunk (instead of one scalar per step).
    """
    R = v_len // LANES

    def one(carry, spec):
        xrow = jax.lax.dynamic_index_in_dim(
            gene_table, spec[1], keepdims=False
        ).astype(jnp.int32)
        sl = jax.lax.dynamic_slice(xrow, (spec[3],), (v_len,))
        return carry, sl.reshape(LANES, R).T

    _, tiles = jax.lax.scan(one, None, band_specs)
    return tiles


def _shift_insert(v, elem, row_mask, lane_mask):
    """Column-major flat shift by one (see pallas_nw._shift_insert)."""
    rolled = pltpu.roll(v, shift=1, axis=0)
    top = pltpu.roll(rolled[0:1, :], shift=1, axis=1)
    top = jnp.where(lane_mask, elem, top)
    return jnp.where(row_mask, top, rolled)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_seg", "rb", "v_len", "ymax", "n_slots", "n_pairs",
        "interpret", "unroll",
    ),
    donate_argnums=(5, 6),  # snaps, brow: revisited in place per segment
)
def _conveyor_fill_segment(
    params: jnp.ndarray,  # (8,) int32: pxy, pgap, ...
    tables: jnp.ndarray,  # (n_chunks_pad, 128) int32, build_chunk_tables
    xtiles: jnp.ndarray,  # (n_bands, R, LANES) int32 per-band x tiles
    y_conv: jnp.ndarray,  # (1, n_chunks_pad*K) int32 y-char stream
    c0: jnp.ndarray,  # (1,) int32 first chunk of this segment (8-aligned)
    snaps: jnp.ndarray,  # (n_chunks_pad, 3, LANES, R) int32, aliased
    brow: jnp.ndarray,  # (n_slots, 1, ymax) int32, aliased
    state: jnp.ndarray,  # (5, R, LANES) int32 sweep carry
    *,
    n_seg: int,
    rb: int,
    v_len: int,
    ymax: int,
    n_slots: int,
    n_pairs: int,
    interpret: bool = False,
    unroll: int = 128,
):
    """One fill segment: chunks [c0, c0 + n_seg) of the conveyor sweep.

    The sweep state rides the ``state`` carry (the r3 kernel kept it in
    VMEM scratch of one whole-workload dispatch); snaps/brow are donated
    and written in place so walks and host decode of early-finishing pairs
    can overlap the remaining fill segments. ``c0`` is a runtime scalar —
    every equal-sized segment shares ONE compiled program.
    """
    R = v_len // LANES
    KC8 = K // LANES
    rb_row = rb % R
    rb_col = rb // R

    tables_seg = jax.lax.dynamic_slice(
        tables, (c0[0], jnp.int32(0)), (n_seg, 128)
    )
    y_seg = jax.lax.dynamic_slice(
        y_conv, (jnp.int32(0), c0[0] * K), (1, n_seg * K)
    )

    def kernel(
        params_ref, tables_ref, xtiles_ref, y_ref, c0_ref,
        state_in, snaps_in, brow_in,
        scores_ref, state_out, snaps_ref, brow_ref,
        top_stage, bot_stage, snap_stage, an_stage, xtile_stage,
        sem_top, sem_bot, sem_snap, sem_an, sem_xt,
    ):
        gi = pl.program_id(0)
        g = c0_ref[0] + gi
        pxy = params_ref[0]
        pgap = params_ref[1]

        @pl.when(gi == 0)
        def _():
            # Per-segment score buffer (merged by max on host; penalties
            # are >= 0) and the state carry staged into the working buffer.
            for p in range(n_pairs):
                scores_ref[p, 0] = -1
            state_out[:, :, :] = state_in[:, :, :]

        s_prev1 = state_out.at[0]
        s_prev1s = state_out.at[1]
        s_prev2s = state_out.at[2]
        s_yd = state_out.at[3]
        s_xv = state_out.at[4]

        row_mask = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) == 0
        lane_mask = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == 0
        last_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == LANES - 1
        )
        flat_q = (
            jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1) * R
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        )
        top_mask = flat_q == 0

        @pl.when(g == 0)
        def _():
            # Fresh state + the analytic boundary row dp[0][j] = j*pgap into
            # brow slot 0 (the top feed of every pair's first band).
            s_prev1[:, :] = jnp.full((R, LANES), NEG_FILL, jnp.int32)
            s_prev1s[:, :] = jnp.full((R, LANES), NEG_FILL, jnp.int32)
            s_prev2s[:, :] = jnp.full((R, LANES), NEG_FILL, jnp.int32)
            s_yd[:, :] = jnp.full((R, LANES), Y_SENTINEL, jnp.int32)
            s_xv[:, :] = jnp.full((R, LANES), X_SENTINEL, jnp.int32)
            an_stage[:, :] = (
                jax.lax.broadcasted_iota(jnp.int32, (1, ymax), 1) * pgap
            )
            cp = pltpu.make_async_copy(
                an_stage, brow_ref.at[0], sem_an
            )
            cp.start()
            cp.wait()

        tr = gi % 8  # row within the (8, 128) table block
        ramp = tables_ref[tr, 0]
        rstart = tables_ref[tr, 1]
        ri0 = tables_ref[tr, 2]
        top_src = tables_ref[tr, 3]
        top_off = tables_ref[tr, 4]
        bot_slot = tables_ref[tr, 5]
        bot_off = tables_ref[tr, 6]
        bot_active = tables_ref[tr, 7]
        ev_local = tables_ref[tr, 8]
        ev_q = tables_ref[tr, 9]
        ev_out = tables_ref[tr, 10]
        ramp_first = tables_ref[tr, 11]
        band_idx = tables_ref[tr, 12]

        cp_top = pltpu.make_async_copy(
            brow_ref.at[top_src, :, pl.ds(pl.multiple_of(top_off, K), K)],
            top_stage,
            sem_top,
        )
        cp_top.start()
        cp_top.wait()

        base_dl = g * K - rstart  # ramp band's local dl at chunk start

        @pl.when(ramp == 1)
        def _():
            # Fetch the ramping band's x tile once (bands' ramps never
            # overlap: stagger >= rb + K), then merge this chunk's K-lane
            # activation range into xv — ONE masked select per chunk
            # replaces the old per-step scalar x injection. Early-writing
            # a lane up to K-1 steps before it activates is safe: the
            # previous owner's last read is >= K steps gone (plan stagger
            # >= prev_n + K) and the new cells' cur is overwritten by the
            # left-border inject at activation. Re-fetch at segment entry
            # (gi == 0) too: a ramp spanning a segment boundary loses the
            # xtile_stage scratch between dispatches.
            @pl.when((ramp_first == 1) | (gi == 0))
            def _():
                cp_x = pltpu.make_async_copy(
                    xtiles_ref.at[band_idx], xtile_stage, sem_xt
                )
                cp_x.start()
                cp_x.wait()

            in_range = (flat_q >= base_dl) & (flat_q < base_dl + K)
            s_xv[:, :] = jnp.where(in_range, xtile_stage[:, :], s_xv[:, :])

        prev1 = s_prev1[:, :]
        prev1s = s_prev1s[:, :]
        prev2s = s_prev2s[:, :]
        yd = s_yd[:, :]
        xv = s_xv[:, :]

        def make_chunk(with_ramp, snap=False):
            def body(c8, carry):
                prev1, prev1s, prev2s, yd = carry
                sbase = pl.multiple_of(c8 * LANES, LANES)
                ychunk = y_ref[0:1, pl.ds(sbase, LANES)]
                topchunk = top_stage[0:1, pl.ds(sbase, LANES)]
                bacc = jnp.zeros((1, LANES), jnp.int32)

                def step(si, icarry):
                    (prev1, prev1s, prev2s, yd, ychunk, topchunk,
                     bacc) = icarry
                    s_local = sbase + si

                    yd = _shift_insert(yd, ychunk, row_mask, lane_mask)
                    sub = jnp.where(xv == yd, 0, pxy)
                    t1 = prev2s + sub
                    t2 = jnp.minimum(prev1, prev1s) + pgap
                    cur = jnp.minimum(t1, t2)
                    cur = jnp.where(top_mask, topchunk, cur)
                    if with_ramp:
                        # Left-border inject at the advancing frontier;
                        # the x chars are already in xv (tile merge above).
                        dl_n = base_dl + s_local
                        cur = jnp.where(
                            flat_q == dl_n, (ri0 + dl_n) * pgap, cur
                        )

                    # Score event: one pair's dp[m][n] surfaces this chunk.
                    @pl.when(s_local == ev_local)
                    def _():
                        scores_ref[ev_out, 0] = jnp.min(
                            jnp.where(flat_q == ev_q, cur, NEG_FILL)
                        )

                    ychunk = pltpu.roll(ychunk, shift=LANES - 1, axis=1)
                    topchunk = pltpu.roll(topchunk, shift=LANES - 1, axis=1)

                    bottom_row = pltpu.roll(
                        cur[rb_row : rb_row + 1, :],
                        shift=(LANES - 1 - rb_col) % LANES,
                        axis=1,
                    )
                    bacc = jnp.where(
                        last_mask,
                        bottom_row,
                        pltpu.roll(bacc, shift=LANES - 1, axis=1),
                    )
                    cur_s = _shift_insert(cur, NEG_FILL, row_mask, lane_mask)
                    if snap:
                        # Snapshot the state at global step g*K — i.e. AFTER
                        # the chunk's first step (which produces band-local
                        # dl = g*K - rstart for each resident band). The walk
                        # seeds segment s of a band at local dl0 = s*K, whose
                        # global step is start + s*K = (start//K + s)*K: the
                        # FIRST step's output of that chunk, not its entry
                        # state (the entry state is at dl0 - 1 — seeding the
                        # walk from it corrupts every segment crossing).
                        # Rows mirror the walk's seed contract: (state@dl0,
                        # shift(state@dl0), shift(state@dl0-1)) — exactly the
                        # step's carry-out triple.
                        @pl.when(s_local == 0)
                        def _():
                            snap_stage[0, :, :] = cur.T
                            snap_stage[1, :, :] = cur_s.T
                            snap_stage[2, :, :] = prev1s.T
                            cp_snap = pltpu.make_async_copy(
                                snap_stage, snaps_ref.at[g], sem_snap
                            )
                            cp_snap.start()
                            cp_snap.wait()
                    return (
                        cur,
                        cur_s,
                        prev1s,
                        yd,
                        ychunk,
                        topchunk,
                        bacc,
                    )

                (prev1, prev1s, prev2s, yd, _, _, bacc) = (
                    jax.lax.fori_loop(
                        0, LANES, step,
                        (prev1, prev1s, prev2s, yd, ychunk, topchunk,
                         bacc),
                        unroll=unroll,
                    )
                )
                bot_stage[0:1, pl.ds(sbase, LANES)] = bacc
                return (prev1, prev1s, prev2s, yd)

            return body

        init = (prev1, prev1s, prev2s, yd)

        @pl.when(ramp == 1)
        def _():
            st0 = make_chunk(True, snap=True)(0, init)
            out = jax.lax.fori_loop(1, KC8, make_chunk(True), st0)
            s_prev1[:, :] = out[0]
            s_prev1s[:, :] = out[1]
            s_prev2s[:, :] = out[2]
            s_yd[:, :] = out[3]

        @pl.when(ramp == 0)
        def _():
            st0 = make_chunk(False, snap=True)(0, init)
            out = jax.lax.fori_loop(1, KC8, make_chunk(False), st0)
            s_prev1[:, :] = out[0]
            s_prev1s[:, :] = out[1]
            s_prev2s[:, :] = out[2]
            s_yd[:, :] = out[3]

        # Bottom boundary-row flush: this chunk's lane-rb harvest is the
        # owner band's dp[i0+rb][col] for cols [bot_off, bot_off+K).
        @pl.when(bot_active == 1)
        def _():
            cp_bot = pltpu.make_async_copy(
                bot_stage,
                brow_ref.at[
                    bot_slot, :, pl.ds(pl.multiple_of(bot_off, K), K)
                ],
                sem_bot,
            )
            cp_bot.start()
            cp_bot.wait()

    n_chunks_pad = tables.shape[0]
    scores, state_new, snaps_new, brow_new = pl.pallas_call(
        kernel,
        grid=(n_seg,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(
                (8, 128), lambda gi: (gi // 8, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # per-band x tiles
            pl.BlockSpec(
                (1, K), lambda gi: (0, gi), memory_space=pltpu.VMEM
            ),  # y stream (segment slice)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # c0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # state carry in
            pl.BlockSpec(memory_space=pltpu.HBM),  # snaps (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # brow (aliased)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scores (per segment)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # state carry out
            pl.BlockSpec(memory_space=pltpu.HBM),  # snaps
            pl.BlockSpec(memory_space=pltpu.HBM),  # brow
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pairs, 1), jnp.int32),
            jax.ShapeDtypeStruct((5, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_chunks_pad, 3, LANES, R), jnp.int32),
            jax.ShapeDtypeStruct((n_slots, 1, ymax), jnp.int32),
        ),
        input_output_aliases={6: 2, 7: 3},
        scratch_shapes=[
            pltpu.VMEM((1, K), jnp.int32),  # top feed stage
            pltpu.VMEM((1, K), jnp.int32),  # bottom harvest stage
            pltpu.VMEM((3, LANES, R), jnp.int32),  # snapshot stage
            pltpu.VMEM((1, ymax), jnp.int32),  # analytic row stage
            pltpu.VMEM((R, LANES), jnp.int32),  # ramping band's x tile
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(params, tables_seg, xtiles, y_seg, c0, state, snaps, brow)
    return scores, state_new, snaps_new, brow_new


def _conveyor_sweep_call(
    params, tables, xtiles, y_conv, *,
    n_chunks, rb, v_len, ymax, n_slots, n_pairs,
    interpret=False, unroll=128,
):
    """Whole-workload sweep in one dispatch (single-segment compatibility).

    Kept for the profilers and the fused `_conveyor_fill_device` path;
    the production driver (`align_pairs_conveyor`) dispatches
    `_conveyor_fill_segment` per chunk range instead.
    """
    R = v_len // LANES
    snaps = jnp.zeros((n_chunks, 3, LANES, R), jnp.int32)
    brow = jnp.zeros((n_slots, 1, ymax), jnp.int32)
    state = jnp.zeros((5, R, LANES), jnp.int32)
    scores, _, snaps, brow = _conveyor_fill_segment(
        params, tables, xtiles, y_conv, jnp.zeros((1,), jnp.int32),
        snaps, brow, state,
        n_seg=n_chunks, rb=rb, v_len=v_len, ymax=ymax, n_slots=n_slots,
        n_pairs=n_pairs, interpret=interpret, unroll=unroll,
    )
    return scores, snaps, brow


@functools.partial(
    jax.jit,
    static_argnames=(
        "xp", "n_chunks", "rb", "v_len", "ymax", "n_slots", "n_pairs",
        "interpret", "unroll",
    ),
)
def _conveyor_fill_device(
    gene_table, band_specs, tables16, params, *,
    xp, n_chunks, rb, v_len, ymax, n_slots, n_pairs,
    interpret=False, unroll=128,
):
    """One-dispatch fill: feeds + x tiles + table pad + sweep.

    ``tables16``: the compact (n_chunks, 16) chunk table (columns 0..12
    used); padding to the kernel's 128-wide SMEM rows happens on device so
    only ~1/8 of the table crosses the host->device link (the link is slow
    in this environment, and fused dispatch also saves per-call latency —
    the banded path's one-call-per-group structure, applied to the sweep).
    """
    y_conv = _build_feeds(
        gene_table, band_specs, xp=xp, n_chunks=n_chunks, rb=rb
    )
    xtiles = _build_xtiles(gene_table, band_specs, v_len=v_len)
    tables = jnp.pad(tables16, ((0, 0), (0, 128 - tables16.shape[1])))
    return _conveyor_sweep_call(
        params, tables, xtiles, y_conv,
        n_chunks=n_chunks, rb=rb, v_len=v_len, ymax=ymax,
        n_slots=n_slots, n_pairs=n_pairs,
        interpret=interpret, unroll=unroll,
    )


@functools.partial(
    jax.jit,
    static_argnames=("xp", "n_chunks_pad", "rb", "v_len"),
)
def _conveyor_prepare(gene_table, band_specs, tables16, *,
                      xp, n_chunks_pad, rb, v_len):
    """Fused feed/table preparation for the segmented fill driver."""
    y_conv = _build_feeds(
        gene_table, band_specs, xp=xp, n_chunks=n_chunks_pad, rb=rb
    )
    xtiles = _build_xtiles(gene_table, band_specs, v_len=v_len)
    tables = jnp.pad(
        tables16,
        ((0, n_chunks_pad - tables16.shape[0]),
         (0, 128 - tables16.shape[1])),
    )
    # Padded chunk rows must carry ev_local = -1 (col 8): an all-zeros row
    # would fire a bogus score event at step 0 into scores[0].
    if n_chunks_pad > tables16.shape[0]:
        pad_col8 = jnp.where(
            (jnp.arange(n_chunks_pad) >= tables16.shape[0])[:, None]
            & (jnp.arange(128) == 8)[None, :],
            -1,
            tables,
        )
        tables = pad_col8
    return y_conv, xtiles, tables


@functools.partial(
    jax.jit,
    static_argnames=(
        "p1", "yfw_len", "yrev_len", "y_cap", "ypad_len",
        "p_group", "g8", "num_bands", "rb", "v_len", "interpret",
        "prefetch", "burst",
    ),
)
def _conveyor_group_walk(
    snaps_flat, brow, gene_table, gpp_g, *,
    p1, yfw_len, yrev_len, y_cap, ypad_len,
    p_group, g8, num_bands, rb, v_len, interpret=False, prefetch=True,
    burst=4,
):
    """One-dispatch group walk: feed build + the P-wide walk kernel."""
    xs_s, yfw_s, yrev_s, wparams = _group_walk_inputs(
        gene_table, gpp_g,
        p1=p1, yfw_len=yfw_len, yrev_len=yrev_len, y_cap=y_cap,
        ypad_len=ypad_len,
    )
    from msa_tpu.ops.pallas_walk import _walk_call

    return _walk_call(
        snaps_flat, brow, xs_s, yfw_s, yrev_s, wparams,
        p_group=p_group, g8=g8, num_bands=num_bands,
        rb=rb, v_len=v_len, interpret=interpret,
        rows_at_col_index=True, prefetch=prefetch, burst=burst,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "p1", "yfw_len", "yrev_len", "y_cap", "ypad_len",
        "p_group", "g8", "num_bands", "rb", "v_len", "interpret",
        "prefetch", "burst",
    ),
)
def _conveyor_walk_scan(
    snaps_flat, brow, gene_table, gpp_chunk, *,
    p1, yfw_len, yrev_len, y_cap, ypad_len,
    p_group, g8, num_bands, rb, v_len, interpret=False, prefetch=True,
    burst=4,
):
    """Several groups' walks in ONE dispatch (lax.scan over groups).

    The host<->device link here pays tens of ms latency per dispatch AND
    per fetch; scanning ``walk_scan_groups`` groups per call cuts both by
    that factor while keeping enough calls for the host's move decode to
    overlap the device's remaining walks. Outputs are stacked
    (G, g8, P, K//16) / (G, g8, P, 8).
    """
    def body(carry, gpp_g):
        moves, meta = _conveyor_group_walk(
            snaps_flat, brow, gene_table, gpp_g,
            p1=p1, yfw_len=yfw_len, yrev_len=yrev_len, y_cap=y_cap,
            ypad_len=ypad_len,
            p_group=p_group, g8=g8, num_bands=num_bands,
            rb=rb, v_len=v_len, interpret=interpret, prefetch=prefetch,
            burst=burst,
        )
        return carry, (moves, meta)

    _, (moves_s, meta_s) = jax.lax.scan(body, None, gpp_chunk)
    return moves_s, meta_s


@functools.partial(
    jax.jit,
    static_argnames=("p1", "yfw_len", "yrev_len", "y_cap", "ypad_len"),
)
def _group_walk_inputs(
    gene_table, gpp, *, p1, yfw_len, yrev_len, y_cap, ypad_len
):
    """Per-group walk feed buffers, derived on device (as in ops.batch)."""
    from msa_tpu.ops.pallas_walk import _build_walk_inputs

    def one(carry, pp):
        xi = pp[24]
        yi = pp[25]
        rev_shift = pp[26]
        xshift8 = jax.lax.dynamic_index_in_dim(
            gene_table, xi, keepdims=False
        )
        ypad8 = jax.lax.dynamic_slice(
            jax.lax.dynamic_index_in_dim(gene_table, yi, keepdims=False),
            (1,),
            (ypad_len,),
        )
        xs32, yfw, yrev = _build_walk_inputs(
            xshift8, ypad8, rev_shift,
            p1=p1, yfw_len=yfw_len, yrev_len=yrev_len, y_cap=y_cap,
        )
        return carry, (xs32[0], yfw[0], yrev[0], pp[8:24])

    _, outs = jax.lax.scan(one, None, gpp)
    return outs


def hbm_snapshot_budget() -> int:
    """HBM bytes available to the conveyor's snapshot table.

    Config override first (``MSA_TPU_HBM_BUDGET``); otherwise the device's
    reported ``bytes_limit`` minus 25% headroom for brow/feeds/walk
    buffers; 12 GiB fallback when the device reports nothing (the v5e
    number the headroom fraction was derived on: 16 GiB * 0.75).
    """
    from msa_tpu.config import DEFAULT

    if DEFAULT.hbm_budget:
        return DEFAULT.hbm_budget
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return int(limit * 0.75)
    except Exception:
        pass
    return 12 << 30


def plan_workload(
    genes: Sequence[str],
    pairs: Sequence[Tuple[int, int]],
    rb: int = RB_CONV,
):
    """Deterministic workload plan: size order, per-pair orientation, bands.

    Returns ``(order, ordered, swapped, plan)``: ``order[r]`` is the
    caller-index of the r-th pair in size-descending conveyor order;
    ``ordered[r]`` its (xi, yi) gene indices after orientation;
    ``swapped[r]`` whether it was transposed; ``plan`` the K-aligned band
    schedule.

    Orientation minimizes conveyor lane-steps: a band of x-length m,
    y-length n occupies the conveyor for ~max(n, rb) + K steps (its
    successor waits on prev_n + K with an rb + K floor), so a pair costs
    ceil(m/rb) * (max(n, rb) + K) steps of rb lanes. The partial last
    band (m % rb rows) wastes (rb - m % rb) lanes for its whole residency
    — on big13 that is 24% of all lane-steps under the fixed (i, j)
    orientation, 13% recovered by choosing per pair. Transposed pairs
    carry a tie-break flag (params col 6) so the walk reproduces the
    original orientation's alignment byte-exactly (see _walk_call).
    """
    num = len(pairs)
    order = sorted(
        range(num),
        key=lambda idx: -(
            len(genes[pairs[idx][0]]) + len(genes[pairs[idx][1]])
        ),
    )

    def orient(i, j):
        cands = []
        for xi, yi, sw in ((i, j, 0), (j, i, 1)):
            mm, nn = len(genes[xi]), len(genes[yi])
            nb = max(1, -(-mm // rb))
            if nb <= 4:
                cands.append((nb * (max(nn, rb) + K), sw, xi, yi))
        if not cands:
            raise ValueError(
                f"pair ({i}, {j}) with lengths "
                f"({len(genes[i])}, {len(genes[j])}) exceeds 4 conveyor "
                f"bands in both orientations at rb={rb}; raise rb (the "
                "walk per-band tables hold 4 bands)"
            )
        cands.sort()
        _, sw, xi, yi = cands[0]
        return xi, yi, sw

    oriented = [orient(*pairs[idx]) for idx in order]
    ordered = [(xi, yi) for xi, yi, _ in oriented]
    swapped = [sw for _, _, sw in oriented]
    plan = plan_conveyor(genes, ordered, rb=rb)
    return order, ordered, swapped, plan


def plan_snapshot_bytes(plan: ConveyorPlan) -> int:
    """HBM bytes the plan's snapshot table will occupy after segment
    padding (mirrors the n_chunks_pad computation in the driver)."""
    segs = max(1, DEFAULT.fill_segments)
    n_chunks_pad = _round_up(-(-plan.n_chunks // segs), 8) * segs
    return n_chunks_pad * 3 * plan.v_len * 4


def align_pairs_conveyor(
    genes: Sequence[str],
    pairs: Sequence[Tuple[int, int]],  # (i, j) gene indices per pair
    pxy: int,
    pgap: int,
    interpret: bool = False,
    rb: int = RB_CONV,
    on_result=None,
) -> List[Tuple[int, str, str]]:
    """Align many big pairs: ONE conveyor fill + per-group batched walks.

    ``on_result(idx, (penalty, a1, a2))`` fires as each pair's walk chunk
    decodes — a crash mid-workload journals every finished pair (the fill
    itself is one device call and is all-or-nothing by design). Callbacks
    may be invoked CONCURRENTLY from the decode worker threads; callers
    with non-thread-safe state must lock (the in-repo journal caller
    does, ``models/kway.py``).

    Workloads whose snapshot table would exceed the device HBM budget
    (``hbm_snapshot_budget``) are split into balanced sub-sweeps
    automatically — the TPU-native analog of the reference sizing itself
    to its 32 GB node budget by design (``testing15/template.slurm:5``).
    """
    from msa_tpu.config import DEFAULT
    from msa_tpu.ops.pallas_walk import (
        W_MAX,
        Y_CAP,
        _walk_call,
        decode_moves,
        walk_slot_budget,
    )
    from msa_tpu.utils.alignment import moves_to_alignment

    P_GROUP = DEFAULT.p_group
    num = len(pairs)
    order, ordered, swapped, plan = plan_workload(genes, pairs, rb=rb)
    v_len = plan.v_len

    # HBM feasibility BEFORE any device work: the snapshot table is
    # (n_chunks_pad, 3, v_len) int32. Over budget -> split the workload
    # into two balanced sub-sweeps and recurse (each side re-checks);
    # a single over-budget pair is genuinely infeasible at this snap_k.
    snaps_bytes = plan_snapshot_bytes(plan)
    budget = hbm_snapshot_budget()
    if snaps_bytes > budget:
        if num < 2:
            raise ValueError(
                f"conveyor snapshot table needs {snaps_bytes / 2**30:.1f} "
                f"GiB ({plan.n_chunks} chunks x 3 x {v_len} lanes at "
                f"snap_k={K}) for a single pair — over the "
                f"{budget / 2**30:.1f} GiB HBM budget; raise snap_k"
            )
        from msa_tpu.utils.logging import get_logger

        get_logger("msa_tpu.conveyor").info(
            "snapshot table %.1f GiB > %.1f GiB HBM budget: splitting %d "
            "pairs into two conveyor sweeps",
            snaps_bytes / 2**30, budget / 2**30, num,
        )
        # Alternate the size-sorted pairs between the halves so both
        # sweeps' chunk counts land near half of the original.
        halves = (
            [idx for r, idx in enumerate(order) if r % 2 == 0],
            [idx for r, idx in enumerate(order) if r % 2 == 1],
        )
        out_split: List[Tuple[int, str, str]] = [None] * num  # type: ignore
        for idxs in halves:
            cb = None
            if on_result is not None:
                def cb(si, triple, idxs=idxs):
                    on_result(idxs[si], triple)

            sub = align_pairs_conveyor(
                genes, [pairs[i] for i in idxs], pxy, pgap,
                interpret=interpret, rb=rb, on_result=cb,
            )
            for si, i in enumerate(idxs):
                out_split[i] = sub[si]
        return out_split

    tables = build_chunk_tables(plan)
    nb_max = 4
    y_cap = max(Y_CAP if not interpret else 0, plan.ymax)
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
    params_dev = jnp.asarray(np.array([pxy, pgap, 0, 0, 0, 0, 0, 0],
                                      np.int32))
    n_pairs_pad = _round_up(num, P_GROUP)

    # Per-pair walk tables from the plan (built BEFORE the fill so walk
    # chunks can dispatch between fill segments).
    by_slot: Dict[int, List[BandPlan]] = {}
    for bp in plan.bands:
        by_slot.setdefault(bp.pair_slot, []).append(bp)

    # Pad the group count up to a multiple of the walk-scan chunk so every
    # scan dispatch shares ONE compiled shape (a ragged last chunk would
    # retrace the Pallas walk — a multi-second compile the scan-chunking is
    # there to avoid). Padding slots replicate pair num-1 (the cheapest:
    # `ordered` is sorted descending), whose extra walks the kernel's
    # any_active guard makes nearly free.
    CH = max(1, DEFAULT.walk_scan_groups)
    p_pad = -(-num // (P_GROUP * CH)) * (P_GROUP * CH)
    rows = np.zeros((p_pad, 32), dtype=np.int32)
    for slot in range(p_pad):
        if slot >= num:
            # Zero-length padding pair: the walk kernel marks m == 0 done
            # at slot init (pallas_walk kernel, st[3p+2]), so whole padded
            # groups cost nothing on device — unlike replicating a real
            # pair, whose walk would run in full.
            rows[slot, 8:16] = [0, 0, pxy, pgap, 0, P1, 0, 0]
            continue
        i, j = ordered[slot]
        m, n = len(genes[i]), len(genes[j])
        P0 = (-n) % LANES
        rows[slot, 8:16] = [
            m, n, pxy, pgap, P1 + P0 + n, P1, swapped[slot], 0,
        ]
        for bp in by_slot[slot]:
            rows[slot, 16 + bp.band] = bp.start // K
            rows[slot, 20 + bp.band] = bp.brow_in
        rows[slot, 24] = i
        rows[slot, 25] = j
        rows[slot, 26] = P1 + P0 + n - y_cap
    gpp = jnp.asarray(rows).reshape(-1, P_GROUP, 32)
    n_groups = p_pad // P_GROUP
    # Slot budget sized PER SCAN CHUNK, not per workload: a pair's walk
    # needs at most (m+n)//K + 2*nb + 4 slots (walk_slot_budget), and
    # pairs are size-sorted, so later chunks hold smaller pairs needing
    # far fewer slots — a chunk-global budget would burn ~100 us of
    # near-empty slot overhead per excess slot (the r3 g8 258->192
    # measurement). Bucket to 64 so similar chunks share one compiled
    # walk program (2-3 distinct shapes per workload, all cached).
    g8_cap = walk_slot_budget(nb_max * rb + y_cap, nb_max)
    needs = [
        walk_slot_budget(len(genes[i]) + len(genes[j]), nb_max)
        for i, j in ordered
    ]

    # Segmented fill: the sweep is dispatched as `segs` equal chunk ranges
    # (state carried between calls, snaps/brow written in place), and each
    # walk scan-chunk dispatches as soon as the fill has covered every
    # chunk its pairs read (plan.pair_ready). The device still executes
    # fill and walks serially, but the HOST starts fetching + decoding the
    # big early pairs while the tail of the fill is still running — the
    # post-decode tail stops serializing after the whole fill.
    segs = max(1, DEFAULT.fill_segments)
    n_seg = _round_up(-(-plan.n_chunks // segs), 8)
    n_chunks_pad = n_seg * segs
    y_conv, xtiles, tables_dev = _conveyor_prepare(
        table_dev, jnp.asarray(band_specs),
        jnp.asarray(np.ascontiguousarray(tables[:, :16])),
        xp=Xp, n_chunks_pad=n_chunks_pad, rb=rb, v_len=v_len,
    )
    R = v_len // LANES
    snaps = jnp.zeros((n_chunks_pad, 3, LANES, R), jnp.int32)
    brow = jnp.zeros((plan.n_slots, 1, plan.ymax), jnp.int32)
    state = jnp.zeros((5, R, LANES), jnp.int32)

    walk_c0s = list(range(0, n_groups, CH))
    ready = []
    g8_chunks = []
    for cw in walk_c0s:
        slots = range(cw * P_GROUP, min((cw + CH) * P_GROUP, p_pad))
        ready.append(max(
            plan.pair_ready[s] if s < num else 0 for s in slots
        ))
        if DEFAULT.walk_g8_mode == "global":
            need_c = max(needs)
        else:
            need_c = max(
                (needs[s] for s in slots if s < num), default=64
            )
        g8_chunks.append(min(g8_cap, _round_up(need_c, 64)))

    score_parts = []
    futs = []
    wq = 0
    for s in range(segs):
        c0 = jnp.asarray([s * n_seg], jnp.int32)
        scores_s, state, snaps, brow = _conveyor_fill_segment(
            params_dev, tables_dev, xtiles, y_conv, c0, snaps, brow, state,
            n_seg=n_seg, rb=rb, v_len=v_len, ymax=plan.ymax,
            n_slots=plan.n_slots, n_pairs=n_pairs_pad,
            interpret=interpret, unroll=1 if interpret else 128,
        )
        score_parts.append(scores_s)
        filled = (s + 1) * n_seg
        while wq < len(walk_c0s) and (
            ready[wq] <= filled or s == segs - 1
        ):
            cw = walk_c0s[wq]
            snaps_flat = snaps.reshape(n_chunks_pad * 3, 1, v_len)
            moves_s, meta_s = _conveyor_walk_scan(
                snaps_flat, brow, table_dev, gpp[cw : cw + CH],
                p1=P1, yfw_len=yfw_len, yrev_len=yrev_len, y_cap=y_cap,
                ypad_len=y_cap,
                p_group=P_GROUP, g8=g8_chunks[wq], num_bands=nb_max,
                rb=rb, v_len=v_len, interpret=interpret,
                prefetch=bool(DEFAULT.walk_prefetch),
                burst=max(1, DEFAULT.walk_burst),
            )
            futs.append((cw, moves_s, meta_s))
            wq += 1

    # Per-segment score buffers merge by max (init -1, penalties >= 0).
    scores = np.maximum.reduce(
        [np.asarray(p) for p in score_parts]
    ).reshape(-1)
    out: List[Tuple[int, str, str]] = [None] * num  # type: ignore

    def decode_one(slot, words_p, count_p):
        idx = order[slot]
        mv = decode_moves(words_p, count_p)
        xi, yi = ordered[slot]
        ax, ay = moves_to_alignment(genes[xi], genes[yi], mv)
        # Transposed pairs swap back: a1 is always the alignment of
        # genes[pairs[idx][0]] (the canonical hash order,
        # submit/xuliny-seqalkway.cpp:209-214).
        if swapped[slot]:
            ax, ay = ay, ax
        out[idx] = (int(scores[slot]), ax, ay)
        if on_result is not None:
            on_result(idx, out[idx])

    # The decode is the only host work left on the critical tail (the
    # vectorized moves_to_alignment and hashlib both release the GIL for
    # their bulk), so spread the pairs of each fetched chunk over a small
    # thread pool; chunk fetches stay in dispatch order so decode of
    # chunk c overlaps the device's walks of chunk c+1.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(
        max_workers=max(1, DEFAULT.decode_workers)
    ) as pool:
        for c0, moves_s, meta_s in futs:
            words_c = np.asarray(moves_s)  # (G, g8, P, K//16)
            meta_c = np.asarray(meta_s)
            jobs = []
            for gl in range(words_c.shape[0]):
                g = c0 + gl
                for p in range(P_GROUP):
                    slot = g * P_GROUP + p
                    if slot >= num:
                        break
                    jobs.append(pool.submit(
                        decode_one, slot,
                        words_c[gl, :, p, :], meta_c[gl, :, p, 0],
                    ))
            for j in jobs:
                j.result()
    return out
