"""Split the batched device call into fill-only vs fill+walk timings."""

import sys
import time

sys.path.insert(0, "/root/repo")

from msa_tpu.utils import jaxenv  # noqa: F401

import functools
import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.utils.msaio import parse_file
from msa_tpu.utils.tasks import pair_task_list
from msa_tpu.ops.batch import _static_geometry
from msa_tpu.ops.buckets import X_SENTINEL, Y_SENTINEL
from msa_tpu.ops.pallas_nw import SNAP_K, _band_sweep_call, build_fill_inputs
from msa_tpu.ops.pallas_walk import K, LANES, Y_CAP


@functools.partial(jax.jit, static_argnames=("p_pad", "emit"))
def fill_batch(gene_table, pair_params, *, p_pad, emit):
    (rb, v_len, num_bands, s_max, Yp, P1, Xp, yfw_len,
     yrev_len) = _static_geometry()

    def one(carry, pp):
        params_fill = pp[0:8]
        xi = pp[24]
        yi = pp[25]
        xshift8 = jax.lax.dynamic_index_in_dim(gene_table, xi, keepdims=False)
        ypad_len = max(Yp, Y_CAP)
        ypad8 = jax.lax.dynamic_slice(
            jax.lax.dynamic_index_in_dim(gene_table, yi, keepdims=False),
            (1,), (ypad_len,),
        )
        xbands, ybuf = build_fill_inputs(
            xshift8, ypad8[:Yp], num_bands=num_bands, rb=rb, v_len=v_len
        )
        score, rows, snaps = _band_sweep_call(
            xbands, ybuf, params_fill,
            num_bands=num_bands, rb=rb, v_len=v_len,
            emit_rows=emit, emit_snaps=emit, snap_k=SNAP_K,
        )
        return carry, (score[0, 0], jnp.sum(rows[..., :8]))

    _, (scores, chk) = jax.lax.scan(one, None, pair_params)
    return scores, chk


def main():
    problem = parse_file("/root/repo/data/mseq-big13-example.txt")
    genes = problem.genes
    tasks = pair_task_list(len(genes))
    pairs = [(t.i, t.j) for t in tasks]
    cells = sum(len(genes[i]) * len(genes[j]) for i, j in pairs)

    (rb, v_len, num_bands, s_max, Yp, P1, Xp, yfw_len,
     yrev_len) = _static_geometry()
    print(f"geometry: rb={rb} v_len={v_len} nb={num_bands} s_max={s_max} Yp={Yp}")

    table = np.full((len(genes), Xp), X_SENTINEL, np.int8)
    for g, seq in enumerate(genes):
        codes = np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)
        table[g, 1 : 1 + len(codes)] = codes
        table[g, 1 + len(seq):] = Y_SENTINEL

    num = len(pairs)
    p_pad = max(16, -(-num // 16) * 16)
    pad_pair = min(pairs, key=lambda ij: len(genes[ij[0]]) * len(genes[ij[1]]))
    rows = np.zeros((p_pad, 32), dtype=np.int32)
    for idx in range(p_pad):
        i, j = pairs[idx] if idx < num else pad_pair
        m, n = len(genes[i]), len(genes[j])
        real_nb = max(1, -(-m // rb))
        q_last = m - (real_nb - 1) * rb
        P0 = (-n) % LANES
        rows[idx, 0:8] = [m, n, problem.pxy, problem.pgap, q_last, real_nb, 0, 0]
        rows[idx, 8:16] = [m, n, problem.pxy, problem.pgap, P1 + P0 + n, P1, 0, 0]
        rows[idx, 24] = i
        rows[idx, 25] = j
        rows[idx, 26] = P1 + P0 + n - Y_CAP

    tbl = jnp.asarray(table)
    rws = jnp.asarray(rows)

    # np.asarray (not block_until_ready) forces the sync: on the axon
    # tunnel block_until_ready can return before execution completes.
    for emit, label in ((False, "score-only"), (True, "emit snaps+rows")):
        out = fill_batch(tbl, rws, p_pad=p_pad, emit=emit)
        _ = tuple(np.asarray(o) for o in out)
        t0 = time.time()
        out = fill_batch(tbl, rws, p_pad=p_pad, emit=emit)
        _ = tuple(np.asarray(o) for o in out)
        dt = time.time() - t0
        print(f"fill batch [{label}]: {dt:.2f}s = {cells/dt/1e9:.1f} GCUPS")


if __name__ == "__main__":
    main()
