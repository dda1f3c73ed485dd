"""CI coverage of the Pallas TPU kernels via interpret mode.

The fill (``ops/pallas_nw``) and walk (``ops/pallas_walk``) kernels are the
production compute path but only ran on hardware in round 1 — a kernel
regression would have passed CI and surfaced at bench time. Both kernels
take ``interpret=``, so these tests execute them on the CPU backend with a
scaled-down geometry (small band height / caps) against the numpy oracle.

Reference methodology: the reference had no unit tests at all (SURVEY.md §4
— golden outputs only); these are the kernel-level tests it lacked.
"""

from __future__ import annotations

import numpy as np
import pytest

from msa_tpu.ops.reference import nw_align_numpy, nw_score_numpy

ALPHA = list("ACGT")


def _rand_seq(rng, n):
    return "".join(rng.choice(ALPHA, n))


# ---------------------------------------------------------------------------
# Fill kernel (banded wavefront sweep), score path
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "m,n,pxy,pgap",
    [
        (130, 290, 3, 2),  # multi-chunk, m < n
        (300, 140, 5, 1),  # m > n, non-default penalties
        (257, 257, 2, 3),  # just past two chunks
    ],
)
def test_fill_score_interpret(m, n, pxy, pgap):
    from msa_tpu.ops.pallas_nw import nw_score_pallas

    rng = np.random.default_rng(m * 1000 + n)
    x, y = _rand_seq(rng, m), _rand_seq(rng, n)
    got = nw_score_pallas(x, y, pxy, pgap, interpret=True, unroll=1)
    assert got == nw_score_numpy(x, y, pxy, pgap)


def test_fill_score_multiband_interpret():
    """m > rb forces several bands; boundary rows carry across grid steps."""
    from msa_tpu.ops.pallas_nw import nw_score_pallas

    rng = np.random.default_rng(7)
    x, y = _rand_seq(rng, 400), _rand_seq(rng, 230)
    got = nw_score_pallas(x, y, 3, 2, rb=128, interpret=True, unroll=1)
    assert got == nw_score_numpy(x, y, 3, 2)


# ---------------------------------------------------------------------------
# Fill + walk (full alignment path), small geometry
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "m,n,pxy,pgap",
    [
        (300, 280, 3, 2),   # multi-band (rb=128), single segment
        (500, 600, 3, 2),   # multi-band AND multi-segment (m+n > K)
        (200, 700, 5, 1),   # wide: y much longer than x
        (500, 150, 4, 3),   # tall: x much longer than y (4 bands at rb=128)
    ],
)
def test_align_walk_interpret(m, n, pxy, pgap):
    from msa_tpu.ops.pallas_walk import nw_align_pallas

    rng = np.random.default_rng(m + 17 * n)
    x, y = _rand_seq(rng, m), _rand_seq(rng, n)
    got = nw_align_pallas(
        x, y, pxy, pgap, interpret=True, rb_align=128, x_cap=1, y_cap_req=1
    )
    want = nw_align_numpy(x, y, pxy, pgap)
    assert got == want  # penalty AND byte-exact alignment (tie-break order)


def test_align_walk_repetitive_interpret():
    """Repetitive sequences maximize tie-breaking pressure in the walk."""
    from msa_tpu.ops.pallas_walk import nw_align_pallas

    x = "ACAC" * 80 + "GG" + "ACAC" * 20
    y = "ACAC" * 95 + "TT"
    got = nw_align_pallas(
        x, y, 3, 2, interpret=True, rb_align=128, x_cap=1, y_cap_req=1
    )
    assert got == nw_align_numpy(x, y, 3, 2)


# ---------------------------------------------------------------------------
# Batched group pipeline (P_GROUP-wide walk), small geometry
# ---------------------------------------------------------------------------


def test_batched_group_walk_interpret(monkeypatch):
    """One group of P_GROUP pairs through the full batched device pipeline."""
    import msa_tpu.ops.batch as batch

    monkeypatch.setattr(batch, "RB_ALIGN", 128)
    monkeypatch.setattr(batch, "X_CAP", 512)
    monkeypatch.setattr(batch, "Y_CAP", 512)

    rng = np.random.default_rng(42)
    genes = [_rand_seq(rng, rng.integers(120, 500)) for _ in range(5)]
    pairs = [(i, j) for i in range(1, 5) for j in range(i)]  # 10 pairs
    got = batch.align_pairs_batched(genes, pairs, 3, 2, interpret=True)
    for (i, j), res in zip(pairs, got):
        assert res == nw_align_numpy(genes[i], genes[j], 3, 2)


# ---------------------------------------------------------------------------
# Conveyor fill (band-interleaved sweep) + global-snapshot walk
# ---------------------------------------------------------------------------


def test_conveyor_interpret(monkeypatch):
    """Whole-workload conveyor fill + walks vs the numpy oracle."""
    import msa_tpu.ops.conveyor as conv

    monkeypatch.setattr(conv, "CHUNK_PAD", 1)
    rng = np.random.default_rng(11)
    # rb must stay a multiple of the walk segment K (band starts and
    # boundary-row flushes are K-aligned); scale the geometry with K so the
    # suite stays valid under MSA_TPU_SNAP_K overrides.
    rb = max(conv.K, 1024)
    scale = rb // 1024
    genes = [
        _rand_seq(rng, n * scale)
        for n in (1400, 2100, 900, 2600, 1300)
    ]
    pairs = [(i, j) for i in range(1, 5) for j in range(i)]  # 10 pairs
    seen = {}
    got = conv.align_pairs_conveyor(
        genes, pairs, 3, 2, interpret=True, rb=rb,
        on_result=lambda idx, triple: seen.setdefault(idx, triple),
    )
    for (i, j), res in zip(pairs, got):
        assert res == nw_align_numpy(genes[i], genes[j], 3, 2), (i, j)
    # Incremental-journal hook: one callback per pair, same triples.
    assert seen == {idx: got[idx] for idx in range(len(pairs))}


def test_conveyor_orientation_skew_interpret(monkeypatch):
    """Extreme-aspect pairs force orientation transposes; output must stay
    byte-exact in the CANONICAL orientation (a1 = alignment of
    genes[pairs[idx][0]]), which exercises the transposed tie-break flag
    (walk params col 6): up/left ties are everywhere in random DNA, so a
    wrong preference under transpose breaks the alignment strings.
    Mirrors data/xulin_adversarial.dat's 70000x30 skew at test scale.
    """
    import msa_tpu.ops.conveyor as conv

    monkeypatch.setattr(conv, "CHUNK_PAD", 1)
    rng = np.random.default_rng(31)
    rb = max(conv.K, 1024)
    scale = rb // 1024
    genes = [
        _rand_seq(rng, n * scale) for n in (2600, 16, 2100, 40, 900)
    ]
    pairs = [(i, j) for i in range(1, 5) for j in range(i)]  # 10 pairs
    # Both orientations of the same skewed pair in one workload.
    pairs += [(1, 0), (0, 1)]
    got = conv.align_pairs_conveyor(
        genes, pairs, 3, 2, interpret=True, rb=rb
    )
    for (i, j), res in zip(pairs, got):
        assert res == nw_align_numpy(genes[i], genes[j], 3, 2), (i, j)


def test_conveyor_many_segments_interpret(monkeypatch):
    """Segmented fill with boundaries landing mid-ramp.

    fill_segments=16 forces segment boundaries every ~8 chunks, so band
    ramps (2-4 chunks at this geometry) frequently span a boundary —
    exercising the xtile re-fetch at segment entry and the state carry
    between dispatches. Results must stay bit-identical to the oracle.
    """
    import msa_tpu.ops.conveyor as conv

    monkeypatch.setattr(conv, "CHUNK_PAD", 1)
    monkeypatch.setattr(conv.DEFAULT, "fill_segments", 16)
    rng = np.random.default_rng(23)
    rb = max(conv.K, 1024)
    scale = rb // 1024
    genes = [
        _rand_seq(rng, n * scale) for n in (2500, 1100, 1900, 700)
    ]
    pairs = [(i, j) for i in range(1, 4) for j in range(i)]  # 6 pairs
    got = conv.align_pairs_conveyor(
        genes, pairs, 3, 2, interpret=True, rb=rb
    )
    for (i, j), res in zip(pairs, got):
        assert res == nw_align_numpy(genes[i], genes[j], 3, 2), (i, j)


def test_conveyor_hbm_autosplit_interpret(monkeypatch):
    """Over-budget snapshot table -> workload splits into sub-sweeps.

    The reference sized itself to its 32 GB node budget by design
    (testing15/template.slurm:5); the conveyor's analog queries the device
    budget and splits the pair list automatically. Force a budget between
    one half's table and the full workload's: the run must split (>= 3
    planner invocations: full + two halves) and stay byte-exact.
    """
    import msa_tpu.ops.conveyor as conv

    monkeypatch.setattr(conv, "CHUNK_PAD", 1)
    rng = np.random.default_rng(7)
    rb = max(conv.K, 1024)
    scale = rb // 1024
    genes = [
        _rand_seq(rng, n * scale) for n in (2600, 2200, 1800, 1400)
    ]
    pairs = [(i, j) for i in range(1, 4) for j in range(i)]  # 6 pairs

    # Size the forced budget from the full workload's own estimate (the
    # same orientation + plan the driver will derive).
    _, _, _, plan = conv.plan_workload(genes, pairs, rb=rb)
    full_bytes = conv.plan_snapshot_bytes(plan)
    monkeypatch.setattr(conv.DEFAULT, "hbm_budget", int(full_bytes * 0.8))

    calls = {"n": 0}
    real_plan = conv.plan_conveyor

    def counting_plan(*a, **kw):
        calls["n"] += 1
        return real_plan(*a, **kw)

    monkeypatch.setattr(conv, "plan_conveyor", counting_plan)
    got = conv.align_pairs_conveyor(
        genes, pairs, 3, 2, interpret=True, rb=rb
    )
    assert calls["n"] >= 3, "workload did not split"
    for (i, j), res in zip(pairs, got):
        assert res == nw_align_numpy(genes[i], genes[j], 3, 2), (i, j)


def test_conveyor_single_pair_over_budget_raises(monkeypatch):
    import msa_tpu.ops.conveyor as conv
    import pytest

    monkeypatch.setattr(conv.DEFAULT, "hbm_budget", 1)
    with pytest.raises(ValueError, match="single pair"):
        conv.align_pairs_conveyor(
            ["A" * 2048, "C" * 2048], [(0, 1)], 3, 2,
            interpret=True, rb=1024,
        )


def test_conveyor_planner_event_collisions():
    """Score events must never collide in a K-chunk (planner defers starts).

    A long-n pair followed by a short-n pair can place two pairs' dp[m][n]
    events in the same chunk; build_chunk_tables holds one event per chunk,
    so plan_conveyor must defer the colliding band. Fuzz the planner over
    random workloads (host-only — no kernel launch).
    """
    import msa_tpu.ops.conveyor as conv

    rng = np.random.default_rng(3)
    for trial in range(30):
        k = int(rng.integers(2, 9))
        lens = [int(rng.integers(1, 4000)) for _ in range(k)]
        genes = ["A" * L for L in lens]
        pairs = [(i, j) for i in range(1, k) for j in range(i)]
        order = sorted(
            range(len(pairs)),
            key=lambda idx: -(
                lens[pairs[idx][0]] + lens[pairs[idx][1]]
            ),
        )
        plan = conv.plan_conveyor(
            genes, [pairs[idx] for idx in order], rb=1024
        )
        t = conv.build_chunk_tables(plan)  # raises on collision
        assert (t[:, 8] >= 0).sum() == len(pairs), trial


def test_conveyor_prefetch_off_interpret(monkeypatch):
    """walk_prefetch=0 (the r4 entry-issue DMA path) stays byte-exact —
    both compiled variants of the walk kernel are correctness-covered."""
    import msa_tpu.ops.conveyor as conv

    monkeypatch.setattr(conv, "CHUNK_PAD", 1)
    monkeypatch.setattr(conv.DEFAULT, "walk_prefetch", 0)
    rng = np.random.default_rng(41)
    rb = max(conv.K, 1024)
    scale = rb // 1024
    genes = [_rand_seq(rng, n * scale) for n in (1700, 1200, 800)]
    pairs = [(i, j) for i in range(1, 3) for j in range(i)]  # 3 pairs
    got = conv.align_pairs_conveyor(
        genes, pairs, 3, 2, interpret=True, rb=rb
    )
    for (i, j), res in zip(pairs, got):
        assert res == nw_align_numpy(genes[i], genes[j], 3, 2), (i, j)
