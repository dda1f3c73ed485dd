"""JAX anti-diagonal sweep vs the NumPy oracle."""

import random

import pytest

from msa_tpu.ops.nw_jax import nw_align_jax, nw_score_jax
from msa_tpu.ops.reference import nw_align_numpy, nw_score_numpy


CASES = [
    ("AGGGCT", "AGGCA", 3, 2),
    ("AAAGGGCT", "AGGCA", 3, 2),
    ("A", "T", 3, 2),
    ("ACGT", "ACGT", 5, 1),
    ("AAAA", "TTTT", 1, 10),
    ("GATTACA", "GCATGCU", 2, 1),
]


@pytest.mark.parametrize("x,y,pxy,pgap", CASES)
def test_score_matches_oracle(x, y, pxy, pgap):
    assert nw_score_jax(x, y, pxy, pgap) == nw_score_numpy(x, y, pxy, pgap)


@pytest.mark.parametrize("x,y,pxy,pgap", CASES)
def test_align_matches_oracle(x, y, pxy, pgap):
    assert nw_align_jax(x, y, pxy, pgap) == nw_align_numpy(x, y, pxy, pgap)


def test_fuzz_scores():
    # Sizes stay <= 250 so every case shares one (256, 256) bucket and the
    # jitted sweep compiles exactly once per penalty signature.
    rng = random.Random(20251)
    for _ in range(25):
        m, n = rng.randint(1, 250), rng.randint(1, 250)
        x = "".join(rng.choice("ACGT") for _ in range(m))
        y = "".join(rng.choice("ACGT") for _ in range(n))
        pxy, pgap = rng.randint(1, 6), rng.randint(1, 6)
        assert nw_score_jax(x, y, pxy, pgap) == nw_score_numpy(
            x, y, pxy, pgap
        ), (m, n, pxy, pgap)


def test_fuzz_alignments():
    rng = random.Random(90026)
    for _ in range(8):
        m, n = rng.randint(1, 250), rng.randint(1, 250)
        x = "".join(rng.choice("ACGT") for _ in range(m))
        y = "".join(rng.choice("ACGT") for _ in range(n))
        pxy, pgap = rng.randint(1, 5), rng.randint(1, 5)
        assert nw_align_jax(x, y, pxy, pgap) == nw_align_numpy(
            x, y, pxy, pgap
        ), (m, n, pxy, pgap)


def test_kway_jax_backend_mseq(data_dir):
    from msa_tpu.models.kway import align_kway
    from msa_tpu.utils.msaio import parse_file
    from tests.test_golden import MSEQ_HASH, MSEQ_PENALTIES

    problem = parse_file(str(data_dir / "mseq.dat"))
    result = align_kway(problem, backend="jax")
    assert result.penalties == MSEQ_PENALTIES
    assert result.chain_hash == MSEQ_HASH
