"""Microbenchmark: jnp diagonal sweep GCUPS on the real device."""

import sys
import time

sys.path.insert(0, "/root/repo")
from msa_tpu.utils import jaxenv  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from msa_tpu.ops.nw_jax import _prep_pair, diag_sweep

print("backend:", jax.default_backend(), jax.devices())

rng = np.random.default_rng(0)


def bench(m, n, reps=3):
    x = "".join(rng.choice(list("ACGT"), m))
    y = "".join(rng.choice(list("ACGT"), n))
    xpad, ybuf, m_, n_, Mp, Np = _prep_pair(x, y)
    args = (
        jnp.asarray(xpad), jnp.asarray(ybuf),
        jnp.int32(m_), jnp.int32(n_), 3, 2,
    )
    t0 = time.time()
    score, _, _ = diag_sweep(*args)
    score.block_until_ready()
    compile_and_first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        score, _, _ = diag_sweep(*args)
        score.block_until_ready()
        ts.append(time.time() - t0)
    t = min(ts)
    gcups = m * n / t / 1e9
    print(
        f"m={m} n={n} bucket=({Mp},{Np}) first={compile_and_first:.2f}s "
        f"best={t*1e3:.1f}ms gcups={gcups:.2f} score={int(score)}",
        flush=True,
    )


bench(2000, 2000)
bench(8000, 8000)
bench(30000, 30000)
bench(90000, 85000, reps=2)
