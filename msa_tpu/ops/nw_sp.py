"""Sequence-parallel (wavefront-sharded) NW sweep over a device mesh.

The reference's intra-pair axis (S3) split one DP matrix's anti-diagonals
across OpenMP threads (``submit/xuliny-seqalkway.cpp:462-491``). The mesh
analog shards the diagonal state vector across devices on a ``wave`` axis;
each step every device updates its lane chunk locally and receives the one
boundary lane it needs from its left neighbor via ``lax.ppermute`` over ICI.

This is the scaling path for a *single giant pair* (pair-level data
parallelism, ``parallel.engine``, is the first choice whenever there are
many pairs — the reference measured the same tradeoff: SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from msa_tpu.ops.nw_jax import NEG_FILL, _prep_pair

DIAG_MATCH, DIAG_SUB, UP, LEFT = 0, 1, 2, 3


def nw_score_wavefront_sharded(
    x: str,
    y: str,
    pxy: int,
    pgap: int,
    mesh: Mesh,
    axis: str = "pairs",
) -> int:
    """Minimum penalty with the diagonal state sharded over ``axis``."""
    D = mesh.shape[axis]
    xpad, ybuf, m, n, Mp, Np = _prep_pair(x, y)
    V = xpad.shape[0]
    Vp = -(-V // D) * D
    xpad = np.concatenate(
        [xpad, np.full(Vp - V, -1, dtype=np.int32)]
    )
    # Extra sentinel margin: the last device's y-window slice may clamp on
    # early (all-invalid) diagonals; keep it in range regardless.
    ybuf = np.concatenate([ybuf, np.full(Vp, -2, dtype=np.int32)])
    chunk = Vp // D
    y_off = V + Np  # same layout contract as nw_jax.diag_sweep

    @jax.jit
    def run(xpad_arr, ybuf_arr, m_, n_):
        def shard_fn(xp_local, yb):
            # xp_local: (chunk,) this device's lanes; yb replicated.
            dev = jax.lax.axis_index(axis)
            off = dev * chunk
            ii = off + jnp.arange(chunk, dtype=jnp.int32)
            vary0 = xp_local[0] * 0

            diag0 = (
                jnp.where(ii == 0, 0, NEG_FILL).astype(jnp.int32) + vary0
            )
            # prev1s must seed as shift(diagonal 0): global lane 1 holds
            # dp[0][0] = 0 (the diagonal neighbor of cell (1,1) at d=2).
            prev1s0 = (
                jnp.where(ii == 1, 0, NEG_FILL).astype(jnp.int32) + vary0
            )
            state = (
                jnp.full((chunk,), NEG_FILL, jnp.int32) + vary0,  # prev2s
                prev1s0,  # prev1s (shift of prev1)
                diag0,  # prev1 (= diagonal 0)
            )

            def shift_in(v):
                """shift(v)[l] = v[l-1]; lane 0 comes from left neighbor."""
                last = v[-1:]
                incoming = jax.lax.ppermute(
                    last, axis, [(i, i + 1) for i in range(D - 1)]
                )
                incoming = jnp.where(dev == 0, NEG_FILL, incoming)
                return jnp.concatenate([incoming, v[:-1]])

            def step(carry, d):
                prev2s, prev1s, prev1 = carry
                yd = jax.lax.dynamic_slice(
                    yb, (y_off - d + off,), (chunk,)
                )
                sub = jnp.where(xp_local == yd, 0, pxy)
                cur = jnp.minimum(
                    prev2s + sub,
                    jnp.minimum(prev1, prev1s) + pgap,
                )
                border = d * pgap
                cur = jnp.where((ii == 0) | (ii == d), border, cur)
                valid = (ii <= jnp.minimum(d, m_)) & (
                    ii >= jnp.maximum(0, d - n_)
                )
                cur = jnp.where(valid, cur, NEG_FILL)
                harvest = jnp.where(
                    (d == m_ + n_) & (ii == m_), cur, 0
                ).sum()
                return (prev1s, shift_in(cur), cur), harvest

            ds = jnp.arange(1, Mp + Np + 1, dtype=jnp.int32)
            _, harvests = jax.lax.scan(step, state, ds)
            return jax.lax.psum(jnp.sum(harvests), axis)[None]

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(axis),
            check_vma=False,
        )(xpad_arr, ybuf_arr)

    out = run(
        jnp.asarray(xpad), jnp.asarray(ybuf), jnp.int32(m), jnp.int32(n)
    )
    return int(np.asarray(out)[0])
