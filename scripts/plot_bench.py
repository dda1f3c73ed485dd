"""Plot benchmark sweeps (the reference's draw.py, for JSON-line records).

Reads ``bench_sweep.jsonl`` (written by scripts/sweep.py) and plots GCUPS by
band size, plus speedup vs the reference's sequential and 12-node baselines
(BASELINE.md).
"""

import json
import sys

BASELINE_SEQ_GCUPS = 0.208  # testing15/sample.txt, 1 core
BASELINE_CLUSTER_GCUPS = 17.77  # 12 nodes x 16 cores


def main(path="bench_sweep.jsonl"):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    if not records:
        print("no records")
        return 1

    # e2e sweep records (kernel=e2e_big13) carry knob columns instead of
    # rb/gcups; print them as their own table and plot only band_score rows.
    e2e = [r for r in records if r.get("kernel") == "e2e_big13"]
    if e2e:
        print(
            f"{'fill':>9} {'snapK':>6} {'pg':>3} {'segs':>5} {'scan':>5} "
            f"{'best':>7} {'vs cluster':>11}"
        )
        for r in e2e:
            print(
                f"{r['fill_mode']:>9} {r['snap_k']:>6} {r['p_group']:>3} "
                f"{r.get('fill_segments', '-'):>5} "
                f"{r.get('walk_scan_groups', '-'):>5} "
                f"{r['gcups_best']:>7.1f} "
                f"{r['gcups_best']/BASELINE_CLUSTER_GCUPS:>10.1f}x"
            )
    records = [r for r in records if r.get("kernel", "band_score") == "band_score"]
    if not records:
        return 0

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        # Headless fallback: text table (same content as the plot).
        print(f"{'rb':>8} {'GCUPS':>8} {'vs 1-core':>10} {'vs cluster':>11}")
        for r in records:
            print(
                f"{r['rb']:>8} {r['gcups']:>8.1f} "
                f"{r['gcups']/BASELINE_SEQ_GCUPS:>9.0f}x "
                f"{r['gcups']/BASELINE_CLUSTER_GCUPS:>10.1f}x"
            )
        return 0

    rbs = [r["rb"] for r in records]
    gc = [r["gcups"] for r in records]
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(rbs, gc, "o-", label="msa_tpu (1 chip)")
    ax.axhline(
        BASELINE_CLUSTER_GCUPS, ls="--", c="gray",
        label="reference 12-node cluster",
    )
    ax.set_xscale("log", base=2)
    ax.set_xlabel("band height rb")
    ax.set_ylabel("GCUPS")
    ax.legend()
    fig.tight_layout()
    fig.savefig("bench_sweep.png", dpi=120)
    print("wrote bench_sweep.png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
