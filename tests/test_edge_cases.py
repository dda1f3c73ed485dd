"""Edge cases the reference's datasets exercise only implicitly.

mseq1.dat contains one identical pair (penalty 0, `BASELINE.md`); the spec
allows any k >= 2 and arbitrary penalty parameters
(`docs/Project2B.pdf` p.5-7 via SURVEY.md §7).
"""

import pytest

from msa_tpu.models.kway import KWayAligner, align_kway
from msa_tpu.models.pairwise import align_pair
from msa_tpu.utils.msaio import Problem


def test_k2_minimal():
    r = KWayAligner(3, 2, backend="numpy").align_all(["ACGT", "ACGT"])
    assert r.penalties == [0]
    assert len(r.chain_hash) == 128


def test_identical_sequences_zero_penalty():
    p, a1, a2 = align_pair("GATTACA", "GATTACA", 5, 1, backend="numpy")
    assert p == 0 and a1 == a2 == "GATTACA"


def test_all_gaps_disjoint_alphabets():
    # No matches possible: optimum is min(substitute everything, all-gaps).
    m, n, pxy, pgap = 4, 6, 9, 2
    p, a1, a2 = align_pair("AAAA", "CCCCCC", pxy, pgap, backend="numpy")
    assert p == min(
        min(m, n) * pxy + abs(m - n) * pgap, (m + n) * pgap
    )
    assert len(a1) == len(a2)


def test_one_char_vs_long():
    p, a1, a2 = align_pair("A", "AAAAAAAA", 3, 2, backend="numpy")
    assert p == 7 * 2
    assert a1.replace("_", "") == "A" and a2 == "AAAAAAAA"


def test_zero_penalty_params():
    # pgap=0 makes every all-gap alignment free; the DP must stay exact.
    p, _, _ = align_pair("ACGT", "TGCA", 3, 0, backend="numpy")
    assert p == 0


def test_backend_agreement_on_repeats():
    # Highly repetitive input maximizes tie-break pressure: every backend
    # must produce the identical alignment, not just the same penalty.
    x, y = "ABAB" * 30, "BABA" * 25
    ref = align_pair(x, y, 3, 2, backend="numpy")
    for backend in ("native", "jax"):
        assert align_pair(x, y, 3, 2, backend=backend) == ref


def test_kway_order_sensitivity():
    # Permuting genes permutes task ids -> different chain hash, same
    # multiset of penalties (the reference's big13-2 dataset checks this).
    g1 = ["AAAA", "ACGT", "GGGG"]
    g2 = ["GGGG", "AAAA", "ACGT"]
    r1 = align_kway(Problem(3, 2, tuple(g1)), backend="numpy")
    r2 = align_kway(Problem(3, 2, tuple(g2)), backend="numpy")
    assert sorted(r1.penalties) == sorted(r2.penalties)
    assert r1.chain_hash != r2.chain_hash


def test_cli_checkpoint_flag(tmp_path, data_dir, capsys):
    from msa_tpu.cli import main

    ckpt = str(tmp_path / "j.jsonl")
    rc = main(
        ["--backend", "numpy", "--input", str(data_dir / "mseq.dat"),
         "--checkpoint", ckpt]
    )
    assert rc == 0
    out1 = capsys.readouterr().out
    assert "602d0f604e8fb908" in out1
    # Resume: all pairs journaled, second run replays them.
    rc = main(
        ["--backend", "numpy", "--input", str(data_dir / "mseq.dat"),
         "--checkpoint", ckpt]
    )
    out2 = capsys.readouterr().out
    assert rc == 0
    assert out1.splitlines()[1:] == out2.splitlines()[1:]
