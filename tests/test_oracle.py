"""Unit tests of the NumPy oracle against a literal transliteration DP.

The reference has no unit tests (SURVEY.md §4); these are the ones it lacks:
kernel vs brute-force DP on random small cases, tie-break property tests,
trim-rule edge cases.
"""

import random

import numpy as np
import pytest

from msa_tpu.ops.reference import (
    nw_align_numpy,
    nw_dirs,
    nw_dp_matrix,
    nw_score_numpy,
)
from msa_tpu.utils.alignment import moves_to_alignment


def brute_dp(x, y, pxy, pgap):
    """Two-loop fill exactly as seqalign-mpi-skeleton.cpp:201-226."""
    m, n = len(x), len(y)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        dp[i][0] = i * pgap
    for j in range(n + 1):
        dp[0][j] = j * pgap
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if x[i - 1] == y[j - 1]:
                dp[i][j] = dp[i - 1][j - 1]
            else:
                dp[i][j] = min(
                    dp[i - 1][j - 1] + pxy,
                    dp[i - 1][j] + pgap,
                    dp[i][j - 1] + pgap,
                )
    return dp


def brute_align(x, y, pxy, pgap):
    """Literal traceback as seqalign-mpi-skeleton.cpp:228-272 + trim."""
    dp = brute_dp(x, y, pxy, pgap)
    m, n = len(x), len(y)
    l = m + n
    xans = [0] * (l + 1)
    yans = [0] * (l + 1)
    i, j = m, n
    xpos = ypos = l
    while not (i == 0 or j == 0):
        if x[i - 1] == y[j - 1]:
            xans[xpos] = x[i - 1]; xpos -= 1
            yans[ypos] = y[j - 1]; ypos -= 1
            i -= 1; j -= 1
        elif dp[i - 1][j - 1] + pxy == dp[i][j]:
            xans[xpos] = x[i - 1]; xpos -= 1
            yans[ypos] = y[j - 1]; ypos -= 1
            i -= 1; j -= 1
        elif dp[i - 1][j] + pgap == dp[i][j]:
            xans[xpos] = x[i - 1]; xpos -= 1
            yans[ypos] = "_"; ypos -= 1
            i -= 1
        elif dp[i][j - 1] + pgap == dp[i][j]:
            xans[xpos] = "_"; xpos -= 1
            yans[ypos] = y[j - 1]; ypos -= 1
            j -= 1
    while xpos > 0:
        if i > 0:
            xans[xpos] = x[i - 1]; i -= 1
        else:
            xans[xpos] = "_"
        xpos -= 1
    while ypos > 0:
        if j > 0:
            yans[ypos] = y[j - 1]; j -= 1
        else:
            yans[ypos] = "_"
        ypos -= 1
    idx = 1
    for a in range(l, 0, -1):
        if xans[a] == "_" and yans[a] == "_":
            idx = a + 1
            break
    a1 = "".join(xans[a] for a in range(idx, l + 1))
    a2 = "".join(yans[a] for a in range(idx, l + 1))
    return dp[m][n], a1, a2


CASES = [
    ("AGGGCT", "AGGCA", 3, 2),
    ("AAAGGGCT", "AGGCA", 3, 2),
    ("A", "A", 3, 2),
    ("A", "T", 3, 2),
    ("A", "", 3, 2),
    ("", "TTT", 3, 2),
    ("", "", 3, 2),
    ("ACGT", "ACGT", 5, 1),
    ("AAAA", "TTTT", 1, 10),
    ("GATTACA", "GCATGCU", 2, 1),
]


@pytest.mark.parametrize("x,y,pxy,pgap", CASES)
def test_matrix_matches_brute(x, y, pxy, pgap):
    got = nw_dp_matrix(x, y, pxy, pgap)
    want = np.array(brute_dp(x, y, pxy, pgap), dtype=np.int32).reshape(
        len(x) + 1, len(y) + 1
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("x,y,pxy,pgap", CASES)
def test_align_matches_brute(x, y, pxy, pgap):
    if not x or not y:
        pytest.skip("brute traceback loop is trivially empty; covered below")
    assert nw_align_numpy(x, y, pxy, pgap) == brute_align(x, y, pxy, pgap)


def test_empty_sequences():
    # m == 0 or n == 0: the whole alignment is the greedy completion.
    pen, a1, a2 = nw_align_numpy("", "TTT", 3, 2)
    assert pen == 6 and a1 == "___" and a2 == "TTT"
    pen, a1, a2 = nw_align_numpy("AG", "", 3, 2)
    assert pen == 4 and a1 == "AG" and a2 == "__"
    pen, a1, a2 = nw_align_numpy("", "", 3, 2)
    assert (pen, a1, a2) == (0, "", "")


def test_random_fuzz_vs_brute():
    rng = random.Random(90025)
    for _ in range(60):
        m = rng.randint(1, 30)
        n = rng.randint(1, 30)
        x = "".join(rng.choice("ACGT") for _ in range(m))
        y = "".join(rng.choice("ACGT") for _ in range(n))
        pxy = rng.randint(1, 6)
        pgap = rng.randint(1, 6)
        assert nw_align_numpy(x, y, pxy, pgap) == brute_align(x, y, pxy, pgap)


def test_score_only_matches_matrix():
    rng = random.Random(7)
    for _ in range(20):
        x = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 50)))
        y = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 50)))
        dp = nw_dp_matrix(x, y, 3, 2)
        assert nw_score_numpy(x, y, 3, 2) == int(dp[len(x), len(y)])


def test_dirs_walk_roundtrip():
    x, y = "AAAGGGCT", "AGGCA"
    dp = nw_dp_matrix(x, y, 3, 2)
    dirs = nw_dirs(dp, x, y, 3, 2)
    from msa_tpu.ops.reference import walk_dirs

    moves = walk_dirs(dirs, len(x), len(y))
    a1, a2 = moves_to_alignment(x, y, moves)
    assert (int(dp[-1, -1]), a1, a2) == brute_align(x, y, 3, 2)


def test_native_score_matches_numpy():
    from msa_tpu.native import native_available, nw_score_native
    from msa_tpu.ops.reference import nw_score_numpy

    if not native_available():
        pytest.skip("native library unavailable")
    import random

    rng = random.Random(5)
    for _ in range(6):
        m, n = rng.randint(0, 80), rng.randint(1, 90)
        x = "".join(rng.choice("ACGT") for _ in range(m))
        y = "".join(rng.choice("ACGT") for _ in range(n))
        assert nw_score_native(x, y, 3, 2) == nw_score_numpy(x, y, 3, 2)


def test_blocked_oracle_matches_full():
    """The memory-bounded blocked traceback is exactly the full-matrix one.

    The blocked path is the host oracle for pairs too big to materialize
    (the r2 adversarial-conformance timeout); exercise block boundaries with
    a tiny block size, including repetitive sequences (tie-break pressure).
    """
    import random

    from msa_tpu.ops.reference import nw_align_numpy_blocked

    rng = random.Random(12)
    cases = []
    for _ in range(8):
        m, n = rng.randint(30, 400), rng.randint(30, 400)
        cases.append((
            "".join(rng.choice("ACGT") for _ in range(m)),
            "".join(rng.choice("ACGT") for _ in range(n)),
        ))
    cases.append(("ACAC" * 60 + "GG", "ACAC" * 70))  # repeats
    for x, y in cases:
        full = (
            nw_dp_matrix(x, y, 3, 2),
        )
        dp = full[0]
        dirs = nw_dirs(dp, x, y, 3, 2)
        from msa_tpu.ops.reference import walk_dirs

        moves = walk_dirs(dirs, len(x), len(y))
        a1, a2 = moves_to_alignment(x, y, moves)
        want = (int(dp[len(x), len(y)]), a1, a2)
        assert nw_align_numpy_blocked(x, y, 3, 2, block=64) == want
        assert nw_align_numpy_blocked(x, y, 5, 1, block=37) == \
            nw_align_numpy_blocked(x, y, 5, 1, block=10**9)
