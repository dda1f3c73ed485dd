"""Multi-process integration: the distributed engine end-to-end on CPU.

Launches REAL separate processes through the CLI with
``jax.distributed.initialize`` + gloo CPU collectives, exercising the full
multi-host path the reference ran over MPI ranks
(``submit/xuliny-seqalkway.cpp:232-417``): per-process LPT shard,
``process_allgather`` merge, identical hash-chain fold, process-0-only
stdout. The golden mseq1 output gates correctness.
"""

from __future__ import annotations

import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

MSEQ1_HASH = (
    "4d676f40ea4c1e6b79f546d8c87214c5c7c18e3e55ed0844edfdc73b82bbc9f2"
    "1b0f4a2eab30b0ddb6b499b623e23e5dd598ef7a5c7175ecfc0235ac0858c20a"
)
MSEQ1_PENALTIES = (
    "5 4 9 12 14 11 11 10 11 10 20 22 16 8 15 36 38 32 24 28 22 31 30 27 "
    "22 20 22 20 20 22 16 8 15 0 22 22 "
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(nproc: int, extra_args=None, tmp_path=None, backend="numpy",
            extra_env=None):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no virtual-device forcing in subprocesses
    env.update(extra_env or {})
    procs = []
    for pid in range(nproc):
        cmd = [
            sys.executable, "-m", "msa_tpu.cli",
            "--distributed",
            "--coordinator", f"127.0.0.1:{port}",
            "--num-processes", str(nproc),
            "--process-id", str(pid),
            "--backend", backend,
            "--platform", "cpu",
            "--input", str(REPO / "data" / "mseq1.dat"),
        ] + (extra_args or [])
        procs.append(
            subprocess.Popen(
                cmd,
                cwd=REPO,
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"proc failed:\n{err[-2000:]}"
        outs.append(out)
    return outs


def test_two_process_golden_mseq1():
    outs = _launch(2)
    # Only process 0 prints the result (gloo emits a stdout banner line;
    # the contract block is the trailing Time/hash/penalties triple).
    lines = [l for l in outs[0].splitlines() if not l.startswith("[Gloo]")]
    assert lines[0].startswith("Time: ") and lines[0].endswith(" us")
    assert lines[1] == MSEQ1_HASH
    assert lines[2] == MSEQ1_PENALTIES.rstrip("\n")  # trailing space kept
    assert MSEQ1_HASH not in outs[1]


@pytest.mark.parametrize("fill_mode", ["banded", "conveyor"])
def test_two_process_batched_pipeline_golden(fill_mode):
    """The pod code path: shard -> batched device pipeline -> allgather.

    Big pairs go through the Pallas pipeline (interpret mode, small
    geometry via MSA_TPU_* env) inside REAL separate processes — the
    combination that runs on an actual pod, which the numpy-backend test
    never exercises. Reference analog: every rank ran the same compute
    path in the worker loop (submit/xuliny-seqalkway.cpp:369-417).
    """
    outs = _launch(
        2,
        backend="pallas",
        extra_env={
            "MSA_TPU_INTERPRET": "1",
            "MSA_TPU_FILL_MODE": fill_mode,
            "MSA_TPU_SMALL_THRESHOLD": "0",
            "MSA_TPU_SNAP_K": "128",
            "MSA_TPU_RB_ALIGN": "128",
            "MSA_TPU_RB_CONVEYOR": "128",
            "MSA_TPU_MAX_SEQ_LEN": "512",
        },
    )
    lines = [l for l in outs[0].splitlines() if not l.startswith("[Gloo]")]
    assert lines[1] == MSEQ1_HASH
    assert lines[2] == MSEQ1_PENALTIES.rstrip("\n")


@pytest.mark.parametrize("fill_mode", ["banded", "conveyor"])
def test_local_multidevice_pipeline_golden(fill_mode):
    """One process, 8 virtual devices: the full pipeline sharded per chip.

    A real TPU host is 1 process x several chips; KWayAligner LPT-splits
    the big-pair workload and runs the whole fill+walk pipeline per local
    device in concurrent threads (models/kway._run_batched). Golden-gated
    on mseq1 with every pair forced through the device path.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 4 virtual devices (not 8): each device compiles its own executables
    # in interpret mode, and 4 already exercises the LPT split + threads.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.update(
        {
            "MSA_TPU_INTERPRET": "1",
            "MSA_TPU_FILL_MODE": fill_mode,
            "MSA_TPU_SMALL_THRESHOLD": "0",
            "MSA_TPU_SNAP_K": "128",
            "MSA_TPU_RB_ALIGN": "128",
            "MSA_TPU_RB_CONVEYOR": "128",
            "MSA_TPU_MAX_SEQ_LEN": "512",
        }
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "msa_tpu.cli",
            "--backend", "pallas",
            "--platform", "cpu",
            "--input", str(REPO / "data" / "mseq1.dat"),
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.splitlines()
    assert lines[1] == MSEQ1_HASH
    assert lines[2] == MSEQ1_PENALTIES.rstrip("\n")


def test_two_process_checkpoint_journals(tmp_path):
    ck = str(tmp_path / "journal-{proc}.jsonl")
    outs = _launch(2, extra_args=["--checkpoint", ck])
    assert MSEQ1_HASH in outs[0]
    # Per-process journals exist and partition the 36 tasks disjointly.
    import json

    seen = {}
    for pid in (0, 1):
        path = tmp_path / f"journal-{pid}.jsonl"
        assert path.exists(), "per-process journal missing"
        for line in path.read_text().splitlines():
            rec = json.loads(line)
            assert rec["task_id"] not in seen, "task duplicated across procs"
            seen[rec["task_id"]] = pid
    assert len(seen) == 36
