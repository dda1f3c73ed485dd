"""Checkpoint / resume of the k-way engine (SURVEY.md §5: the reference had
no recovery story; failed runs restarted from scratch)."""

import json

from msa_tpu.models.kway import align_kway
from msa_tpu.utils.checkpoint import PairJournal, problem_key
from msa_tpu.utils.msaio import parse_file

GOLDEN_MSEQ1 = "4d676f40ea4c1e6b"


def test_journal_roundtrip(tmp_path):
    j = PairJournal(str(tmp_path / "ckpt.jsonl"), "key1")
    j.record(3, 42, "a" * 128)
    j.record(1, 7, "b" * 128)
    j.close()
    loaded = PairJournal(str(tmp_path / "ckpt.jsonl"), "key1").load()
    assert loaded == {3: (42, "a" * 128), 1: (7, "b" * 128)}


def test_journal_ignores_other_problem(tmp_path):
    path = str(tmp_path / "ckpt.jsonl")
    j = PairJournal(path, "key1")
    j.record(0, 1, "c" * 128)
    j.close()
    assert PairJournal(path, "key2").load() == {}


def test_journal_skips_torn_tail(tmp_path):
    path = str(tmp_path / "ckpt.jsonl")
    j = PairJournal(path, "k")
    j.record(0, 5, "d" * 128)
    j.close()
    with open(path, "a") as fh:
        fh.write('{"problem": "k", "task_id": 1, "pen')  # crash mid-write
    assert PairJournal(path, "k").load() == {0: (5, "d" * 128)}


def test_resume_produces_identical_output(tmp_path, data_dir):
    problem = parse_file(str(data_dir / "mseq1.dat"))
    path = str(tmp_path / "run.jsonl")

    full = align_kway(problem, backend="numpy")
    assert full.chain_hash.startswith(GOLDEN_MSEQ1)

    # First run journals everything.
    r1 = align_kway(problem, backend="numpy", checkpoint=path)
    assert r1.chain_hash == full.chain_hash
    n_records = sum(1 for _ in open(path))
    assert n_records == problem.num_pairs

    # Simulate a crash that lost the last 10 pairs; resume must recompute
    # only those and still emit the identical hash + penalties.
    lines = open(path).readlines()
    with open(path, "w") as fh:
        fh.writelines(lines[:-10])
    r2 = align_kway(problem, backend="numpy", checkpoint=path)
    assert r2.chain_hash == full.chain_hash
    assert r2.penalties == full.penalties


def test_problem_key_sensitivity():
    k1 = problem_key(3, 2, ["AC", "GT"])
    assert k1 != problem_key(3, 1, ["AC", "GT"])
    assert k1 != problem_key(3, 2, ["AC", "GA"])
    assert k1 != problem_key(3, 2, ["ACG", "T"])  # boundary shift
    assert k1 == problem_key(3, 2, ["AC", "GT"])
