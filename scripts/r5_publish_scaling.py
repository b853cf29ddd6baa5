#!/usr/bin/env python
"""Regenerate BENCH/scaling.json + the scaling section of
BENCH/BASELINE.md from the round-5 pinned triple (BENCH/r5_pin{2,8,32}
.out, produced by scripts/r5_scaling.sh under calm-window gating).

Also fits the two-parameter Amdahl model wall(N) = S + W/N by least
squares over the three pinned legs — S is the per-crawl serial driver
floor (job submission barriers, Catalyst planning, commit marker I/O),
the lever the round-4 wave-loop restructure targeted.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

BENCH = Path(__file__).resolve().parent.parent / "BENCH"


def _leg(n: int) -> dict:
    return json.load(open(BENCH / f"r5_pin{n}.out"))


def main() -> None:
    legs = {n: _leg(n) for n in (2, 8, 32)}
    walls = {n: legs[n]["value"] for n in legs}
    tputs = {
        n: legs[n]["crawl"]["urls_fetched_plus_deduped_per_sec"] for n in legs
    }
    steals = {n: legs[n]["crawl"]["cpu_steal_pct"] for n in legs}
    ndocs = legs[32]["crawl"]["n_docs"]
    depth = legs[32]["crawl"]["depth"]

    # least-squares fit wall = S + W/N over the three (N, wall) points
    xs = [1.0 / n for n in (2, 8, 32)]
    ys = [walls[n] for n in (2, 8, 32)]
    mx, my = sum(xs) / 3, sum(ys) / 3
    W = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    S = my - W * mx

    pairs = []
    for a, b in ((8, 32), (2, 8)):
        pairs.append(
            {
                "cpus": [a, b],
                "ndocs": ndocs,
                "depth": depth,
                "wall_sec": [walls[a], walls[b]],
                "throughput": [tputs[a], tputs[b]],
                "speedup": round(walls[a] / walls[b], 3),
                "scaling_efficiency_n_to_4n": round(
                    walls[a] / walls[b] / 4.0, 3
                ),
                "cpu_steal_pct": [steals[a], steals[b]],
            }
        )
    out = {
        "round": 5,
        "pairs": pairs,
        "amdahl_fit": {
            "serial_floor_sec": round(S, 1),
            "parallel_work_sec": round(W, 1),
            "model": "wall(N) = S + W/N, least squares over pinned 2/8/32",
            "caveat": (
                "the r5 2-core leg carries 15.3% steal (no calm window "
                "in 10 attempts) so this fit OVERstates S; the directly "
                "measured driver-serial floor is ~18 s/crawl (per-wave "
                "phase timers + zero-task concurrency analysis, "
                "BENCH/ANALYSIS.md round 5) and honest 2->8 ~= 0.64"
            ),
        },
        "runs": [legs[n] for n in (2, 8, 32)],
    }
    (BENCH / "scaling.json").write_text(json.dumps(out, indent=1))

    eff28 = pairs[1]["scaling_efficiency_n_to_4n"]
    eff832 = pairs[0]["scaling_efficiency_n_to_4n"]
    table = (
        "| pair | corpus | depth | wall N | wall 4N | tput N | tput 4N "
        "| speedup | efficiency | steal% N/4N |\n"
        "|---|---|---|---|---|---|---|---|---|---|\n"
        f"| local[8]→local[32] | {ndocs} docs | {depth} "
        f"| {walls[8]}s | {walls[32]}s | {tputs[8]} | {tputs[32]} "
        f"| {round(walls[8]/walls[32],3)}x | **{eff832}** "
        f"| {steals[8]}/{steals[32]} |\n"
        f"| local[2]→local[8] | {ndocs} docs | {depth} "
        f"| {walls[2]}s | {walls[8]}s | {tputs[2]} | {tputs[8]} "
        f"| {round(walls[2]/walls[8],3)}x | **{eff28}** "
        f"| {steals[2]}/{steals[8]} |\n"
    )
    md = (BENCH / "BASELINE.md").read_text()
    # swap the results table in place (first markdown table in the file)
    md = re.sub(
        r"\| pair \| corpus.*?\n(\|[^\n]*\n)+", table, md, count=1,
        flags=re.S,
    )
    (BENCH / "BASELINE.md").write_text(md)
    print(
        json.dumps(
            {
                "walls": walls,
                "steals": steals,
                "eff_2_to_8": eff28,
                "eff_8_to_32": eff832,
                "amdahl_S": round(S, 1),
                "amdahl_W": round(W, 1),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
