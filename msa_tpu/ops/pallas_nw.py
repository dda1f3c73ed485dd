"""Pallas TPU wavefront kernels for Needleman–Wunsch.

TPU-native re-design of the reference's OpenMP anti-diagonal tile kernel
(``submit/xuliny-seqalkway.cpp:419-566``). Instead of a tile grid over CPU
threads, the DP matrix is swept in horizontal *bands* of ``RB`` rows; inside
a band a hardware loop walks the local anti-diagonals with the whole diagonal
held in VMEM as a (R, 128) tile, and the VPU updates every cell of a diagonal
per step. The band boundary row is carried across grid steps in a persistent
VMEM scratch (the TPU grid is sequential), replacing the reference's
shared-memory tile edges.

Mosaic allows scalar loads/stores only on SMEM, so all per-step scalar
traffic (y character feed, boundary-row feed, bottom-row harvest) is chunked:
an outer loop loads/stores aligned (1, 128) vectors every 128 steps, and the
inner 128-step loop extracts/inserts lane values with cheap register rolls.

Diagonal state layout ("column-major flat"): flat index q = c*R + r for
array position [r, c], q = i - i0 along the band diagonal. A flat shift by
one is then a sublane roll (axis 0) plus a lane roll of a single (1, 128)
row for the column boundary — far cheaper than lane-rolling the whole array.

Recurrence per local diagonal dl (cells q, j = dl - q):

    left (q, j-1)   -> prev1[q]
    up   (q-1, j)   -> prev1[q-1]  (shifted copy, carried)
    diag (q-1, j-1) -> prev2[q-1]  (shifted copy, carried)

The reference's match shortcut collapses into min-of-three with zero
substitution cost (adjacent DP cells differ by at most pgap, so the diagonal
always wins on a match — proof in ops/reference.py).

Boundary-row layout note: the carried/emitted row buffers store row values
for columns j = 1..n at index j-1 (no j = 0 slot; dp[i][0] = i*pgap is
analytic). This keeps every chunked access 128-aligned.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msa_tpu.config import DEFAULT
from msa_tpu.ops.buckets import X_SENTINEL, Y_SENTINEL

NEG_FILL = 2**30  # "+inf"-ish filler (plain int: jnp scalars would be
                  # captured as traced constants inside Pallas kernels)

LANES = 128


def _shift_insert(v, elem, row_mask, lane_mask):
    """Flat shift by one in column-major order, inserting ``elem`` at flat 0.

    v has shape (R, 128); flat index q = c*R + r. Output[q] = v[q-1],
    output[0] = elem. ``elem`` may be a scalar or a (1, 128) vector whose
    lane 0 carries the value (no cross-lane reduction needed — jnp.where
    picks lane 0 elementwise).
    """
    rolled = pltpu.roll(v, shift=1, axis=0)  # out[r, c] = v[r-1, c]
    # Row 0 must come from the previous column's last row: v[R-1, c-1].
    top = pltpu.roll(rolled[0:1, :], shift=1, axis=1)  # v[R-1, c-1] at [0, c]
    top = jnp.where(lane_mask, elem, top)  # flat 0 gets the new element
    return jnp.where(row_mask, top, rolled)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_bands", "rb", "v_len", "emit_rows", "emit_snaps", "interpret",
        "unroll", "snap_k",
    ),
)
def _band_sweep_call(
    xbands: jnp.ndarray,  # (num_bands, R, 128) int32, col-major band chars
    ybuf: jnp.ndarray,  # (1, Yp) int32, y codes padded with sentinel
    params: jnp.ndarray,  # (8,) int32: m, n, pxy, pgap, q_last, ...
    *,
    num_bands: int,
    rb: int,
    v_len: int,
    emit_rows: bool,
    emit_snaps: bool = False,
    interpret: bool = False,
    unroll: int = 128,
    snap_k: int = 512,
):
    R = v_len // LANES
    Yp = ybuf.shape[1]
    assert rb % LANES == 0 and Yp % LANES == 0
    KC = snap_k // LANES  # chunks per snapshot period
    s_max = (rb + Yp) // snap_k + 1

    def kernel(
        params_ref, x_ref, y_ref, score_ref, rows_ref, snaps_ref,
        brow, snap_stage, snap_sem,
    ):
        b = pl.program_id(0)
        n = params_ref[1]
        pxy = params_ref[2]
        pgap = params_ref[3]
        q_last = params_ref[4]
        # Actual band count; bands >= real_nb are compiled in but skipped
        # (zero-trip loops), so one compile serves every m in the bucket.
        real_nb = params_ref[5]
        band_on = b < real_nb

        row_mask = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) == 0
        lane_mask = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == 0
        last_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == LANES - 1
        )
        flat_q = (
            jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1) * R
            + jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        )
        rb_mask = flat_q == rb

        # First band: boundary row is dp[0][j] = j*pgap at index j-1.
        @pl.when(b == 0)
        def _():
            jj = jax.lax.broadcasted_iota(jnp.int32, (1, Yp), 1)
            brow[:, :] = (jj + 1) * pgap

        i0 = b * rb
        xv = x_ref[0]

        # State at dl = 0: lane 0 holds dp[i0][0] = i0*pgap.
        init = jnp.where(flat_q == 0, i0 * pgap, NEG_FILL).astype(jnp.int32)
        prev1 = init
        prev1s = _shift_insert(init, NEG_FILL, row_mask, lane_mask)
        prev2s = jnp.full((R, LANES), NEG_FILL, jnp.int32)
        yd = jnp.full((R, LANES), Y_SENTINEL, jnp.int32)

        # dl = 1 .. rb + n, processed in 128-step chunks (over-running the
        # end computes masked garbage that is never read back). Inactive
        # bands run zero chunks; the last band only has q_last real rows,
        # so its sweep stops at dl = q_last + n (rounded up to a chunk) —
        # its bottom row and later snapshots are never read.
        full_chunks = (rb + n + LANES - 1) // LANES
        last_chunks = (q_last + n + LANES - 1) // LANES
        num_chunks = jnp.where(
            band_on,
            jnp.where(b == real_nb - 1, last_chunks, full_chunks),
            0,
        )
        rb_row = rb % R  # lane q == rb lives at [rb % R, rb // R]
        rb_col = rb // R

        def make_outer(with_left_border):
            def outer(k, carry):
                prev1, prev1s, prev2s, yd = carry
                base = pl.multiple_of(k * LANES, LANES)

                if emit_snaps:
                    # Snapshot the wavefront state entering step base+1
                    # every snap_k steps: transpose to flat-q raster and DMA
                    # to HBM. Seeds the traceback walk (pallas_walk).
                    @pl.when(k % KC == 0)
                    def _():
                        snap_stage[0, :, :] = prev1.T
                        snap_stage[1, :, :] = prev1s.T
                        snap_stage[2, :, :] = prev2s.T
                        sidx = b * s_max + k // KC
                        cp = pltpu.make_async_copy(
                            snap_stage, snaps_ref.at[sidx], snap_sem
                        )
                        cp.start()
                        cp.wait()

                ychunk = y_ref[0:1, pl.ds(base, LANES)]
                topchunk = brow[0:1, pl.ds(base, LANES)]
                bacc = jnp.zeros((1, LANES), jnp.int32)

                def inner(s, icarry):
                    prev1, prev1s, prev2s, yd, ychunk, topchunk, bacc = icarry
                    dl = base + s + 1

                    # Lane 0 of ychunk/topchunk holds this step's y[dl-1] /
                    # dp[i0][dl]; injected via elementwise selects — no
                    # cross-lane scalar reductions on the critical path.
                    yd = _shift_insert(yd, ychunk, row_mask, lane_mask)
                    sub = jnp.where(xv == yd, 0, pxy)
                    t1 = prev2s + sub
                    t2 = jnp.minimum(prev1, prev1s) + pgap
                    cur = jnp.minimum(t1, t2)

                    # Top boundary (q == 0): (1,128) topchunk broadcasts
                    # over rows; top_mask selects only [0, 0].
                    cur = jnp.where(top_mask, topchunk, cur)
                    if with_left_border:
                        # Left boundary (q == dl -> j == 0):
                        # dp[i0+dl][0] = (i0+dl)*pgap. Only while dl <= rb,
                        # i.e. only in phase-1 chunks.
                        cur = jnp.where(
                            flat_q == dl, (i0 + dl) * pgap, cur
                        )

                    ychunk = pltpu.roll(ychunk, shift=LANES - 1, axis=1)
                    topchunk = pltpu.roll(topchunk, shift=LANES - 1, axis=1)

                    # Bottom-row harvest (q == rb): static row slice; move
                    # lane rb_col to lane 127 with a static roll and insert
                    # into bacc (after 128 steps lane s holds step s value).
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

                    # Final score: dp[m][n] at q == q_last, dl == q_last + n.
                    @pl.when((b == real_nb - 1) & (dl == q_last + n))
                    def _():
                        score_ref[0, 0] = jnp.min(
                            jnp.where(flat_q == q_last, cur, NEG_FILL)
                        )

                    return (
                        cur,
                        _shift_insert(cur, NEG_FILL, row_mask, lane_mask),
                        prev1s,
                        yd,
                        ychunk,
                        topchunk,
                        bacc,
                    )

                prev1, prev1s, prev2s, yd, _, _, bacc = jax.lax.fori_loop(
                    0, LANES, inner,
                    (prev1, prev1s, prev2s, yd, ychunk, topchunk, bacc),
                    unroll=unroll,
                )

                # Flush harvested bottom-row values: chunk dl in
                # (base, base+128] maps to row indices dl-rb stored at
                # dl-rb-1 = base-rb .. base-rb+127.
                @pl.when(base >= rb)
                def _():
                    brow[
                        0:1, pl.ds(pl.multiple_of(base - rb, LANES), LANES)
                    ] = bacc

                return (prev1, prev1s, prev2s, yd)

            return outer

        rbcol_mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == rb_col
        )
        top_mask = flat_q == 0
        # Phase 1 (dl <= rb): left-border handling on. Phase 2: off.
        state = jax.lax.fori_loop(
            0, jnp.minimum(rb // LANES, num_chunks), make_outer(True),
            (prev1, prev1s, prev2s, yd),
        )
        jax.lax.fori_loop(
            rb // LANES, num_chunks, make_outer(False), state
        )

        if emit_rows:
            rows_ref[0, 0:1, :] = brow[0:1, :]

    # (num_bands, 8, Yp): the (8, Yp) trailing dims satisfy the TPU block
    # tiling rule; only row 0 of the middle dim is used.
    rows_shape = (
        jax.ShapeDtypeStruct((num_bands, 8, Yp), jnp.int32)
        if emit_rows
        else jax.ShapeDtypeStruct((1, 1), jnp.int32)
    )
    rows_spec = (
        pl.BlockSpec((1, 8, Yp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        if emit_rows
        else pl.BlockSpec(memory_space=pltpu.VMEM)
    )
    snaps_shape = (
        jax.ShapeDtypeStruct(
            (num_bands * s_max, 3, LANES, R), jnp.int32
        )
        if emit_snaps
        else jax.ShapeDtypeStruct((1, 1, 1, 1), jnp.int32)
    )

    score, rows, snaps = pl.pallas_call(
        kernel,
        grid=(num_bands,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params
            pl.BlockSpec(
                (1, R, LANES), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ybuf
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            rows_spec,
            pl.BlockSpec(memory_space=pltpu.HBM),  # snaps
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            rows_shape,
            snaps_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM((1, Yp), jnp.int32),  # carried boundary row
            pltpu.VMEM((3, LANES, R), jnp.int32),  # snapshot staging
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(params, xbands, ybuf)
    return score, rows, snaps


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _pack_band_chars(x: str, rb: int, v_len: int) -> np.ndarray:
    """Host-side packing of x codes into per-band column-major (R, 128) tiles.

    Band b, flat q -> x[i0 + q - 1] (q = 0 unused); col-major: [r, c] holds
    flat q = c*R + r.
    """
    m = len(x)
    num_bands = max(1, -(-m // rb))
    R = v_len // LANES
    codes = np.frombuffer(x.encode("latin-1"), dtype=np.uint8).astype(np.int32)
    out = np.full((num_bands, v_len), X_SENTINEL, dtype=np.int32)
    for b in range(num_bands):
        i0 = b * rb
        lo = i0
        hi = min(m, i0 + v_len - 1)
        if hi > lo:
            out[b, 1 : 1 + hi - lo] = codes[lo:hi]
    # reorder flat -> (R, 128) column-major: arr[r, c] = flat[c*R + r]
    return out.reshape(num_bands, LANES, R).transpose(0, 2, 1).copy()


SNAP_K = DEFAULT.snap_k  # snapshot stride == walk segment K (one knob)


def _band_geometry(m: int, n: int, rb: int, y_cap: int = 0,
                   align_mode: bool = False):
    if not align_mode:
        # Score path: shrink the band to the sequence (exact shapes).
        rb = min(rb, _round_up(max(m, 1), LANES))
    v_len = _round_up(rb + 1, 8 * LANES)
    if align_mode:
        # Align path: rb stays fixed so every pair in the bucket shares one
        # compiled kernel, and the snapshot slices require the state's last
        # dim (R = v_len/128) to be a multiple of 128 for aligned HBM
        # slicing. Wasted lanes are masked garbage.
        v_len = _round_up(rb + 1, LANES * LANES)
    num_bands = max(1, -(-m // rb))
    q_last = m - (num_bands - 1) * rb
    # y buffer must cover chunked reads up to num_chunks*128 + 128. With
    # y_cap the shape is independent of the exact n (one compile per rb /
    # num_bands bucket); the sweep itself runs only rb + n real steps.
    Yp = _round_up(rb + max(n, y_cap) + 2 * SNAP_K, 8 * LANES)
    return rb, v_len, num_bands, q_last, Yp


def _band_sweep(
    x: str,
    y: str,
    pxy: int,
    pgap: int,
    rb: int = 8192,
    emit_rows: bool = False,
    emit_snaps: bool = False,
    interpret: bool = False,
    unroll: int = 128,
    y_cap: int = 0,
):
    m, n = len(x), len(y)
    rb, v_len, num_bands, q_last, Yp = _band_geometry(
        m, n, rb, y_cap=y_cap, align_mode=emit_snaps
    )

    xbands = _pack_band_chars(x, rb, v_len)
    ycodes = np.full((1, Yp), Y_SENTINEL, dtype=np.int32)
    ycodes[0, :n] = np.frombuffer(y.encode("latin-1"), dtype=np.uint8)
    params = np.array(
        [m, n, pxy, pgap, q_last, num_bands, 0, 0], dtype=np.int32
    )

    score, rows, snaps = _band_sweep_call(
        jnp.asarray(xbands),
        jnp.asarray(ycodes),
        jnp.asarray(params),
        num_bands=num_bands,
        rb=rb,
        v_len=v_len,
        emit_rows=emit_rows,
        emit_snaps=emit_snaps,
        interpret=interpret,
        unroll=unroll,
        snap_k=SNAP_K,
    )
    return score[0, 0], rows, snaps


def nw_score_pallas(
    x: str,
    y: str,
    pxy: int,
    pgap: int,
    rb: int = DEFAULT.score_rb,
    interpret: bool = False,
    unroll: int = 128,
) -> int:
    """Minimum penalty via the banded Pallas sweep."""
    score, _, _ = _band_sweep(
        x, y, pxy, pgap, rb=rb, emit_rows=False, interpret=interpret,
        unroll=unroll,
    )
    return int(score)


def nw_align_pallas(*args, **kwargs):
    """Re-export: fill + traceback walk live in ops.pallas_walk."""
    from msa_tpu.ops.pallas_walk import nw_align_pallas as _impl

    return _impl(*args, **kwargs)


@functools.partial(
    jax.jit, static_argnames=("num_bands", "rb", "v_len")
)
def build_fill_inputs(xshift8, ypad8, *, num_bands, rb, v_len):
    """Device-side construction of the fill kernel's int32 inputs.

    Only raw int8 code buffers cross the host->device link (the link is the
    bottleneck in this environment); band packing, widening, and padding all
    run on device. ``xshift8[t] = code(x[t-1])`` (sentinel elsewhere),
    ``ypad8`` is y codes padded to Yp with sentinel.
    """
    xs = xshift8.astype(jnp.int32)
    bands = jnp.stack(
        [
            jax.lax.dynamic_slice(xs, (b * rb,), (v_len,))
            for b in range(num_bands)
        ]
    )
    # flat q = c*R + r -> [r, c]: reshape to (LANES, R) then transpose.
    xbands = bands.reshape(num_bands, LANES, v_len // LANES).transpose(
        0, 2, 1
    )
    ybuf = ypad8.astype(jnp.int32)[None, :]
    return xbands, ybuf
