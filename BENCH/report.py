#!/usr/bin/env python3
"""Derive the BASELINE.md scaling numbers from BENCH/scaling_results.jsonl.

Single source of truth: every throughput/efficiency figure quoted in
BENCH/BASELINE.md must appear in (or be computed here from) the jsonl.
Prints a markdown fragment with medians + ranges per (cpus, scale) group,
strong-scaling efficiencies from those medians, and the weak-scaling pairs.
Run after BENCH/run_scaling.sh.
"""

from __future__ import annotations

import json
import statistics as st
import sys


def load(path: str = "BENCH/scaling_results.jsonl"):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main() -> None:
    rows = load(sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_results.jsonl")
    groups: dict[tuple[int, int], list[dict]] = {}
    for r in rows:
        groups.setdefault((r["cpus"], r["scale"]), []).append(r)

    # counters must be identical within a scale (byte-identical work)
    for scale in {s for _, s in groups}:
        cs = [r["counters"] for (c, s), g in groups.items() if s == scale for r in g]
        assert all(c == cs[0] for c in cs), f"counter drift at scale {scale}"

    def med(vals):
        return st.median(vals)

    print("## Scaling summary (derived from scaling_results.jsonl)\n")
    print("| cpus | scale | turns | n runs | warm wall med [min..max] s | med turns/s | cold walls s |")
    print("|---|---|---|---|---|---|---|")
    stats = {}
    for (cpus, scale), g in sorted(groups.items(), key=lambda kv: (kv[0][1], kv[0][0])):
        walls = [r["wall_sec"] for r in g]
        colds = [w for r in g for w in r.get("cold_walls", [])]
        turns = g[0]["turns"]
        m = med(walls)
        stats[(cpus, scale)] = {"wall": m, "turns": turns, "n": len(walls)}
        print(
            f"| {cpus} | {scale} | {turns:,} | {len(walls)} | "
            f"{m:.1f} [{min(walls):.1f}..{max(walls):.1f}] | "
            f"{turns / m:,.0f} | {', '.join(f'{c:.1f}' for c in colds)} |"
        )

    print("\n### Strong scaling (fixed input, median warm walls)\n")
    scales = sorted({s for _, s in stats})
    for s in scales:
        cpus_here = sorted(c for c, sc in stats if sc == s)
        for lo, hi in [(a, b) for a in cpus_here for b in cpus_here if b == 4 * a]:
            tlo, thi = stats[(lo, s)]["wall"], stats[(hi, s)]["wall"]
            print(
                f"- scale {s}: T{lo}/(4*T{hi}) = {tlo:.1f}/(4*{thi:.1f}) = "
                f"**{tlo / (4 * thi):.2f}**"
            )

    print("\n### Weak scaling (4x cores on 4x data, median warm walls)\n")
    for (clo, slo), (chi, shi) in [
        ((2, 300), (8, 1200)),
        ((2, 1200), (8, 4800)),
        ((8, 1200), (32, 4800)),
    ]:
        if (clo, slo) in stats and (chi, shi) in stats:
            tlo, thi = stats[(clo, slo)]["wall"], stats[(chi, shi)]["wall"]
            tps = stats[(chi, shi)]["turns"] / thi
            print(
                f"- local[{clo}]@{stats[(clo, slo)]['turns']:,} = {tlo:.1f}s vs "
                f"local[{chi}]@{stats[(chi, shi)]['turns']:,} = {thi:.1f}s "
                f"({tps:,.0f} turns/s): weak efficiency {tlo:.1f}/{thi:.1f} = "
                f"**{tlo / thi:.2f}**"
            )

    print("\n### Per-stage medians (seconds, warm)\n")
    stages = ["conv", "sig", "exact", "cands", "verify", "substr"]
    print("| cpus | scale | " + " | ".join(stages) + " |")
    print("|---" * (len(stages) + 2) + "|")
    for (cpus, scale), g in sorted(groups.items(), key=lambda kv: (kv[0][1], kv[0][0])):
        meds = [med([r["stages"].get(s) or 0.0 for r in g]) for s in stages]
        print(
            f"| {cpus} | {scale} | " + " | ".join(f"{v:.1f}" for v in meds) + " |"
        )

    rec = [r for r in rows if "recall" in r]
    if rec:
        r = rec[-1]
        print(
            f"\nRecall (scale {r['scale']}): {r['recalled']:,}/{r['truth_pairs']:,}"
            f" = {r['recall']:.6f}, extra pairs = {r['extra_pairs']}"
        )


if __name__ == "__main__":
    main()
