"""Golden conformance tests against the reference outputs.

Expected values are the reference's recorded cluster outputs
(``testing15/mseq-12node-16-cpt-1-npn-snowy.out``, ``…/mseq1-…out``,
``testing15/sample.txt``; also ``docs/Project2B.pdf`` p.7) — see BASELINE.md.
"""

import pytest

from msa_tpu.models.kway import align_kway
from msa_tpu.utils.msaio import parse_file

MSEQ_HASH = (
    "602d0f604e8fb908195d53e681094f7d063c4168a33a18f32b4ca3d29f27073a"
    "486dca2ab98aab9eb47f5c407b5c59b8e6c0fa8ef4d07d131b8d6a66a37a065f"
)
MSEQ_PENALTIES = [5, 4, 9]

MSEQ1_HASH = (
    "4d676f40ea4c1e6b79f546d8c87214c5c7c18e3e55ed0844edfdc73b82bbc9f2"
    "1b0f4a2eab30b0ddb6b499b623e23e5dd598ef7a5c7175ecfc0235ac0858c20a"
)
MSEQ1_PENALTIES = [
    5, 4, 9, 12, 14, 11, 11, 10, 11, 10, 20, 22, 16, 8, 15, 36, 38, 32,
    24, 28, 22, 31, 30, 27, 22, 20, 22, 20, 20, 22, 16, 8, 15, 0, 22, 22,
]


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_mseq_golden(data_dir, backend):
    problem = parse_file(str(data_dir / "mseq.dat"))
    result = align_kway(problem, backend=backend)
    assert result.penalties == MSEQ_PENALTIES
    assert result.chain_hash == MSEQ_HASH


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_mseq1_golden(data_dir, backend):
    problem = parse_file(str(data_dir / "mseq1.dat"))
    result = align_kway(problem, backend=backend)
    assert result.penalties == MSEQ1_PENALTIES
    assert result.chain_hash == MSEQ1_HASH


def test_mseq_alignments(data_dir):
    """The individual alignments recorded during the survey (SURVEY.md §4.6)."""
    problem = parse_file(str(data_dir / "mseq.dat"))
    result = align_kway(problem, backend="numpy", keep_alignments=True)
    pairs = [(r.align1, r.align2) for r in result.pair_results]
    assert pairs[0] == ("A_GGCA", "AGGGCT")
    assert pairs[1] == ("AAAGGGCT", "__AGGGCT")
    assert pairs[2] == ("AAAGGGCT", "__A_GGCA")


def test_cli_output_contract(data_dir, capsys):
    from msa_tpu.cli import main

    rc = main(["--backend", "numpy", "--input", str(data_dir / "mseq.dat")])
    assert rc == 0
    out = capsys.readouterr().out
    lines = out.split("\n")
    assert lines[0].startswith("Time: ") and lines[0].endswith(" us")
    assert lines[1].startswith("602d0f604e8fb908")
    assert lines[2] == "5 4 9 "
    assert out.endswith("\n")
